"""Native k-mer index builder parity: gt_index_graph must reproduce the
Python rolling-entry walk label-for-label (same sorted keys, same per-key
label order)."""

import numpy as np
import pytest

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.index.build import _index_graph_native, index_graph_py
from graphtyper_tpu.io.native import available
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(not available(), reason="native library not built")


def _assert_index_equal(a, b):
    np.testing.assert_array_equal(a.keys, b.keys)
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.label_start, b.label_start)
    np.testing.assert_array_equal(a.label_end, b.label_end)
    np.testing.assert_array_equal(a.label_var_id, b.label_var_id)


def test_fixture_graphs(data_dir):
    fa = str(data_dir / "index_test.fa")
    vcf = str(data_dir / "index_test.vcf.gz")
    for chrom in ("chr1", "chr2", "chr3", "chr4"):
        g = construct_graph(fa, vcf, chrom, use_index=True)
        na = _index_graph_native(g)
        py = index_graph_py(g)
        assert na is not None
        _assert_index_equal(na, py)
        assert py.num_labels > 0
    # SV graphs add breakpoint nodes with <SV:...> tag characters
    g = construct_graph(fa, vcf, "chr5", use_index=True, is_sv_graph=True)
    _assert_index_equal(_index_graph_native(g), index_graph_py(g))


def test_simulated_graph(tmp_path):
    cfg = SimConfig(region_length=12000, coverage=1.0, seed=5)
    sim = simulate_cohort(str(tmp_path), cfg)
    g = construct_graph(sim.fasta, sim.vcf, f"{cfg.chrom}:1-{cfg.region_length}", use_index=True)
    na = _index_graph_native(g)
    py = index_graph_py(g)
    _assert_index_equal(na, py)


def test_add_all_graph_with_events(tmp_path):
    """add_all_variants graphs carry events/anti-events on var nodes (the
    phasing-constrained indexing path, indexer.cpp:114-140)."""
    import gzip

    from graphtyper_tpu.graph.coords import GenomicRegion
    from graphtyper_tpu.pipeline.genotype import genotype

    cfg = SimConfig(region_length=9000, coverage=20.0, seed=9)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    # run the pipeline to produce an extracted sites VCF with GT_HAPLOTYPE
    out = genotype(
        sim.fasta, sim.sams, f"{cfg.chrom}:1-{cfg.region_length}", str(tmp_path / "out")
    )
    sites = str(tmp_path / "out" / "input_sites" / cfg.chrom)
    import os

    site_files = [os.path.join(sites, f) for f in os.listdir(sites)]
    g = construct_graph(
        sim.fasta, site_files[0], f"{cfg.chrom}:1-{cfg.region_length}", use_index=True, add_all_variants=True
    )
    assert any(vn.events or vn.anti_events for vn in g.var_nodes) or len(g.var_nodes) > 0
    na = _index_graph_native(g)
    py = index_graph_py(g)
    _assert_index_equal(na, py)
