"""CRAM -> decompressed-BAM-bytes native bridge (gt_cram_slice_to_bam):
records parsed from the converted bytes must match read_cram field by
field, and the native CRAM bamshrink path must be byte-identical to the
Python object path."""

import os
import tempfile

import numpy as np
import pytest

from graphtyper_tpu.io.native import get_lib


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_cram_to_bam_roundtrip(tmp_path):
    from graphtyper_tpu.io.bam import read_bam
    from graphtyper_tpu.io.bgzf import BgzfWriter
    from graphtyper_tpu.io.cram import read_cram
    from graphtyper_tpu.io.cram_native import cram_to_bam_bytes
    from graphtyper_tpu.utils.simulate_indep import IndepConfig, simulate_indep

    ind = simulate_indep(str(tmp_path), IndepConfig(region_length=30_000, coverage=12.0, seed=5))
    path = ind.sams[0]
    data = cram_to_bam_bytes(path)
    assert data is not None
    bam = str(tmp_path / "conv.bam")
    w = BgzfWriter(bam)
    w.write(data)
    w.close()
    h1, a = read_bam(bam, parse_tags=True)
    h2, b = read_cram(path, parse_tags=True)
    assert h1.ref_names == h2.ref_names and h1.ref_lengths == h2.ref_lengths
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        assert (x.name, x.flag, x.ref_id, x.pos, x.mapq, x.cigar) == (
            y.name, y.flag, y.ref_id, y.pos, y.mapq, y.cigar)
        assert (x.mate_ref_id, x.mate_pos, x.tlen, x.seq, x.tags) == (
            y.mate_ref_id, y.mate_pos, y.tlen, y.seq, y.tags)
        assert (np.asarray(x.qual) == np.asarray(y.qual)).all()


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_cram_bamshrink_native_byte_identical(tmp_path):
    import graphtyper_tpu.io.cram_native as cn
    from graphtyper_tpu.io.bgzf import decompress_all
    from graphtyper_tpu.pipeline.bamshrink import bamshrink
    from graphtyper_tpu.utils.simulate_indep import IndepConfig, simulate_indep

    ind = simulate_indep(str(tmp_path), IndepConfig(region_length=40_000, coverage=15.0, seed=7))
    path = ind.sams[0]
    o1 = str(tmp_path / "nat.bam")
    bamshrink(path, "chrI", 2000, 30000, o1)
    orig = cn.cram_to_bam_bytes
    cn.cram_to_bam_bytes = lambda *a, **k: None
    try:
        o2 = str(tmp_path / "py.bam")
        bamshrink(path, "chrI", 2000, 30000, o2)
    finally:
        cn.cram_to_bam_bytes = orig
    assert decompress_all(o1) == decompress_all(o2)
