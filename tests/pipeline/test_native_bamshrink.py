"""Native bamshrink parity: gt_bamshrink must produce record-identical
output to the Python filter/trim/rename path."""

import numpy as np
import pytest

from graphtyper_tpu.config import Options, current_options, replace, set_options
from graphtyper_tpu.io.bam import read_alignments
from graphtyper_tpu.io.native import available
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(not available(), reason="native library not built")


def _assert_same(out_py, out_na):
    h1, r1 = read_alignments(out_py, parse_tags=True)
    h2, r2 = read_alignments(out_na, parse_tags=True)
    assert len(r1) == len(r2)
    for a, b in zip(r1, r2):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.ref_id == b.ref_id
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        np.testing.assert_array_equal(a.qual, b.qual)
        assert a.tlen == b.tlen
        assert a.tags == b.tags


def _run_both(tmp_path, bam, intervals, multi=False, cov=-1.0):
    from graphtyper_tpu.pipeline.bamshrink import bamshrink, bamshrink_multi

    old = current_options()
    out_py = str(tmp_path / "py.bam")
    out_na = str(tmp_path / "na.bam")
    try:
        set_options(replace(old, native_aligner="off"))
        if multi:
            bamshrink_multi(bam, intervals, out_py, cov)
        else:
            bamshrink(bam, *intervals[0], out_py, cov)
        set_options(replace(old, native_aligner="on"))
        if multi:
            bamshrink_multi(bam, intervals, out_na, cov)
        else:
            bamshrink(bam, *intervals[0], out_na, cov)
    finally:
        set_options(old)
    _assert_same(out_py, out_na)


def test_parity_single_region(tmp_path):
    cfg = SimConfig(region_length=12000, coverage=18.0, seed=91, out_format="bam", error_rate=0.01)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    _run_both(tmp_path, sim.sams[0], [("chrS", 2000, 9000)])


def test_parity_with_coverage_cap_and_edges(tmp_path):
    """Coverage-capped bins and reads with N runs / soft clips / AS-XS tags
    exercise the trim and tag paths."""
    import numpy as np

    cfg = SimConfig(region_length=8000, coverage=25.0, seed=92, out_format="sam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    # inject edge-case reads into the SAM, then convert to BAM
    lines = open(sim.sams[0]).read().splitlines()
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    rng = np.random.default_rng(0)
    extra = []
    seq = "ACGT" * 40
    extra.append(f"nrun\t99\tchrS\t3001\t60\t160M\t=\t3301\t360\tNNNN{seq[4:]}\tIIII{'I' * 156}")
    extra.append(f"nrun\t147\tchrS\t3301\t60\t160M\t=\t3001\t-360\t{seq[:-3]}NNN\t{'I' * 160}")
    extra.append(f"clip\t99\tchrS\t4001\t60\t20S120M20S\t=\t4301\t360\t{seq}\t{'I' * 160}")
    extra.append(f"clip\t147\tchrS\t4301\t3\t150M10S\t=\t4001\t-360\t{seq}\t{'I' * 160}")
    extra.append(f"asxs\t0\tchrS\t5001\t60\t160M\t*\t0\t0\t{seq}\t{'I' * 160}\tAS:i:100\tXS:i:99")
    extra.append(f"asxs2\t0\tchrS\t5001\t60\t160M\t*\t0\t0\t{seq}\t{'I' * 160}\tAS:i:150\tXS:i:10")
    with open(str(tmp_path / "edge.sam"), "w") as f:
        f.write("\n".join(hdr + sorted(body + extra, key=lambda l: int(l.split("\t")[3]))) + "\n")
    from graphtyper_tpu.io.bam import read_sam
    from graphtyper_tpu.io.bam_writer import write_bam

    h, reads = read_sam(str(tmp_path / "edge.sam"), parse_tags=True)
    bam = str(tmp_path / "edge.bam")
    write_bam(bam, h, reads)
    _run_both(tmp_path, bam, [("chrS", 1000, 7000)], cov=0.05)


def test_parity_multi_interval(tmp_path):
    cfg = SimConfig(region_length=10000, coverage=15.0, seed=93, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    _run_both(tmp_path, sim.sams[0], [("chrS", 1000, 3000), ("chrS", 6000, 9000)], multi=True)
