"""CRAI write/read/query + region-filtered CRAM decode (io/crai.py,
io/cram.py records(region=...))."""

import numpy as np
import pytest

from graphtyper_tpu.io.bam import read_alignments
from graphtyper_tpu.io.crai import crai_query, read_crai, write_crai
from graphtyper_tpu.io.cram import read_cram
from graphtyper_tpu.utils.simulate_indep import IndepConfig, simulate_indep


@pytest.fixture(scope="module")
def cram(tmp_path_factory):
    d = tmp_path_factory.mktemp("crai")
    cfg = IndepConfig(region_length=120_000, n_samples=1, coverage=12.0, seed=17)
    sim = simulate_indep(str(d), cfg)
    return sim.sams[0], cfg.chrom


def test_crai_roundtrip_and_query(cram, tmp_path):
    path, chrom = cram
    crai_path = write_crai(path, str(tmp_path / "x.crai"))
    entries = read_crai(crai_path)
    # our writer emits 10k-record slices; 120kb @ 12x ~ 9.5k reads -> >=1 slice
    assert len(entries) >= 1
    assert all(e.slice_size > 0 and e.span > 0 for e in entries)
    # whole-file query selects every mapped slice
    assert len(crai_query(entries, 0, 0, 10**9)) == len(
        [e for e in entries if e.seq_id in (0, -2)]
    )
    # a window beyond the contig selects nothing
    assert crai_query(entries, 0, 10**8, 2 * 10**8) == []


def test_region_read_superset_and_filtered_equality(cram):
    path, chrom = cram
    _, all_reads = read_cram(path)
    for beg, end in [(0, 30_000), (50_000, 70_000), (110_000, 120_000)]:
        _, got = read_cram(path, region=(chrom, beg, end))
        got_names = {(r.name, r.pos) for r in got}
        # every read starting inside the window must be present
        want = {(r.name, r.pos) for r in all_reads if beg <= r.pos < end}
        assert want <= got_names
        # and records decode identically to the full read
        by_key = {(r.name, r.pos, r.flag): r for r in all_reads}
        for r in got:
            full = by_key[(r.name, r.pos, r.flag)]
            assert np.array_equal(r.seq, full.seq)
            assert r.cigar == full.cigar

    # unknown contig -> empty
    _, none = read_cram(path, region=("chrUnknown", 0, 1000))
    assert none == []


def test_cram_bamshrink_region_matches_full(cram, tmp_path):
    """The .cram Python shrink path (region-filtered decode) must produce
    output byte-identical to a full-decode shrink."""
    path, chrom = cram
    from graphtyper_tpu.io.cram import CramFile
    from graphtyper_tpu.pipeline.bamshrink import _rename_sort_write, _shrink_region, bamshrink
    from graphtyper_tpu.config import Options

    out_region = str(tmp_path / "region.bam")
    bamshrink(path, chrom, 40_000, 80_000, out_region)

    header, reads = read_cram(path, parse_tags=True)
    opts = Options()
    kept = []
    _shrink_region(header, reads, chrom, 40_000, 80_000, -1.0, opts, kept, set())
    out_full = str(tmp_path / "full.bam")
    _rename_sort_write(header, kept, out_full)
    with open(out_region, "rb") as a, open(out_full, "rb") as b:
        assert a.read() == b.read()
