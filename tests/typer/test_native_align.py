"""Native C++ batch aligner parity: gt_align_batch must reproduce the Python
seeding/lattice/walk pipeline (typer/alignment.py) path-for-path."""

import numpy as np
import pytest

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.graph.coords import GenomicRegion
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.pipeline.caller import read_pool_records
from graphtyper_tpu.typer import native_align
from graphtyper_tpu.typer.alignment import align_read
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(
    not native_align.available(), reason="native library not built"
)


def _assert_geno_equal(g_py, g_na, what):
    assert len(g_py.paths) == len(g_na.paths), what
    assert g_py.longest_path_length == g_na.longest_path_length, what
    for p, q in zip(g_py.paths, g_na.paths):
        assert p.start == q.start, what
        assert p.end == q.end, what
        assert p.read_start_index == q.read_start_index, what
        assert p.read_end_index == q.read_end_index, what
        assert p.mismatches == q.mismatches, what
        assert p.var_order == q.var_order, what
        assert p.nums == q.nums, what


def _check_workload(graph, index, reads, force_both=False):
    na = native_align.NativeAligner(graph, index)
    batch = na.align_batch(reads, force_both=force_both)
    for read, (n1, n2) in zip(reads, batch):
        g1, g2 = align_read(graph, index, read, force_both)
        _assert_geno_equal(g1, n1, f"fwd {read.name}@{read.pos}")
        _assert_geno_equal(g2, n2, f"rev {read.name}@{read.pos}")


def test_simulated_cohort_parity(tmp_path):
    cfg = SimConfig(region_length=8000, coverage=12.0, n_samples=1, seed=21, error_rate=0.01)
    sim = simulate_cohort(str(tmp_path), cfg)
    graph = construct_graph(sim.fasta, sim.vcf, f"{cfg.chrom}:1-{cfg.region_length}", use_index=True)
    index = index_graph(graph)
    _, pooled = read_pool_records(sim.sams, GenomicRegion.parse(f"{cfg.chrom}:1-{cfg.region_length}"))
    reads = [t[0] for t in pooled]
    assert len(reads) > 300
    _check_workload(graph, index, reads)
    # both-orientations mode (camou) exercises the reverse alignment for all
    _check_workload(graph, index, reads[:100], force_both=True)


def test_fixture_reads_parity(data_dir):
    """The reference's own test.sam over the fixture graph (chr1-chr4 contigs,
    N-containing and ambiguous reads included)."""
    from graphtyper_tpu.io.bam import read_alignments

    fa = str(data_dir / "index_test.fa")
    vcf = str(data_dir / "index_test.vcf.gz")
    for chrom in ("chr1", "chr2", "chr3", "chr4"):
        graph = construct_graph(fa, vcf, chrom, use_index=True)
        index = index_graph(graph)
        header, reads = read_alignments(str(data_dir / "test.sam"), parse_tags=True)
        reads = [r for r in reads if r.ref_id >= 0 and header.ref_names[r.ref_id] == chrom]
        if reads:
            _check_workload(graph, index, reads)
