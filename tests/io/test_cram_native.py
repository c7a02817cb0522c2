"""Native CRAM slice decoder (gt_cram.cpp) vs the Python decoder: every
field of every record must match on both CRAM flavors we encounter — our
own writer's (reference-less, verbatim 'b' features, BYTE_ARRAY_STOP) and
htslib's test.cram (reference-based X/I/D/S features, constant Huffmans,
detached mates, NM/MD regeneration)."""

import os
import tempfile

import numpy as np
import pytest

from graphtyper_tpu.io.cram import CramFile, _decode_slice, read_cram
from graphtyper_tpu.io.cram_native import decode_slice_native
from graphtyper_tpu.io.native import get_lib

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def _python_reads(path, ref_path=None, region=None):
    """The pre-native read_cram semantics: Python decoder end to end."""
    import graphtyper_tpu.io.cram_native as cn

    orig = cn.decode_slice_native
    cn.decode_slice_native = lambda *a, **k: None
    try:
        return read_cram(path, ref_path=ref_path, region=region)
    finally:
        cn.decode_slice_native = orig


def _assert_reads_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.name == y.name
        assert x.flag == y.flag, x.name
        assert x.ref_id == y.ref_id
        assert x.pos == y.pos, x.name
        assert x.mapq == y.mapq
        assert x.cigar == y.cigar, x.name
        assert x.mate_ref_id == y.mate_ref_id, x.name
        assert x.mate_pos == y.mate_pos, x.name
        assert x.tlen == y.tlen, x.name
        assert x.seq == y.seq, x.name
        assert (np.asarray(x.qual) == np.asarray(y.qual)).all(), x.name
        assert x.tags == y.tags, x.name


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_native_matches_python_own_writer():
    from graphtyper_tpu.utils.simulate_indep import IndepConfig, simulate_indep

    tmp = tempfile.mkdtemp(prefix="gt_cramnat_")
    ind = simulate_indep(tmp, IndepConfig(region_length=30_000, coverage=12.0, seed=5))
    path = ind.sams[0]
    assert path.endswith(".cram")
    h1, native = read_cram(path, ref_path=ind.fasta, parse_tags=True)
    h2, python = _python_reads(path, ref_path=ind.fasta)
    _assert_reads_equal(native, python)
    # and the region-sliced variant
    hn, native_r = read_cram(path, region=("chrI", 5_000, 12_000))
    hp, python_r = _python_reads(path, region=("chrI", 5_000, 12_000))
    _assert_reads_equal(native_r, python_r)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_native_matches_python_htslib_cram():
    path = os.path.join(DATA, "test.cram")
    if not os.path.exists(path):
        pytest.skip("no htslib test.cram fixture")
    ref = os.path.join(DATA, "index_test.fa")
    ref = ref if os.path.exists(ref) else None
    h1, native = read_cram(path, ref_path=ref, parse_tags=True)
    h2, python = _python_reads(path, ref_path=ref)
    assert native, "no records decoded"
    _assert_reads_equal(native, python)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_native_slice_decoder_used_on_own_writer():
    """The fast path actually engages (not silently falling back)."""
    from graphtyper_tpu.utils.simulate_indep import IndepConfig, simulate_indep

    tmp = tempfile.mkdtemp(prefix="gt_cramnat2_")
    ind = simulate_indep(tmp, IndepConfig(region_length=20_000, coverage=8.0, seed=6))
    cf = CramFile(ind.sams[0], None)
    engaged = 0
    for ch, sh, core, ext, counter, ref_getter in cf._iter_slices(None):
        ref = ref_getter(sh.ref_id) if sh.ref_id >= 0 else b""
        recs = decode_slice_native(ch, sh, ext, counter, ref)
        if recs is not None:
            engaged += 1
    assert engaged > 0
