"""Flat-first graph invariants: graphs built by add_genomic_region keep the
flat arrays canonical; lazily materialized node objects must describe the
exact same graph (and re-flattening them must reproduce the arrays)."""

import numpy as np

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.graph.graph import GraphFlat


def _fa(data_dir):
    return str(data_dir / "index_test.fa")


def _vcf(data_dir):
    return str(data_dir / "index_test.vcf.gz")


def _assert_flat_equal(a: GraphFlat, b: GraphFlat):
    assert a.ref_bytes == b.ref_bytes
    assert a.var_bytes == b.var_bytes
    for name in (
        "ref_order", "ref_dna_start", "ref_dna_len", "ref_var_first",
        "var_order", "var_dna_start", "var_dna_len", "var_out_ref",
        "sp_ref_reach", "sp_actual", "ev_off", "ev_vals", "anti_off", "anti_vals",
    ):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name), err_msg=name)


def test_lazy_nodes_match_flat(data_dir):
    for chrom in ("chr1", "chr2", "chr3", "chr8", "chr9", "chr10", "chr11"):
        g = construct_graph(_fa(data_dir), _vcf(data_dir), chrom)
        # built flat-first: nodes not materialized yet
        assert g._ref_nodes is None and g._var_nodes is None
        flat = g.flat()
        assert flat is g._flat
        # flat-mode queries before materialization
        sites = g.genotypes()
        snps = [g.is_snp(s) for s in sites]
        seqs = [g.get_genotype_seqs(s) for s in sites]
        nums = [g.get_variant_num(v) for v in range(len(flat.var_order))]
        first = g.first_ref_order()
        size = g.size()
        ok = g.check()
        # force materialization and re-flatten from the node objects
        _ = g.ref_nodes
        assert g._ref_nodes is not None
        reflat = GraphFlat.from_nodes(g)
        reflat.sp_ref_reach = np.asarray(g.ref_reach_poses, dtype=np.int64)
        reflat.sp_actual = np.asarray(g.actual_poses, dtype=np.int64)
        _assert_flat_equal(flat, reflat)
        # node-mode queries agree with the flat-mode answers
        g2 = g  # same graph, now node-backed paths run
        assert [s.__dict__ for s in g2.genotypes()] == [s.__dict__ for s in sites]
        assert [g2.is_snp(s) for s in g2.genotypes()] == snps
        assert [g2.get_genotype_seqs(s) for s in g2.genotypes()] == seqs
        assert [g2.get_variant_num(v) for v in range(len(g2.var_nodes))] == nums
        assert g2.first_ref_order() == first
        assert g2.size() == size
        assert g2.check() == ok
        assert g2.get_all_ref() == g2.reference


def test_variant_num_materialization(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr3")
    variant_nums = [vn.label.variant_num for vn in g.var_nodes]
    # per-site allele indices restart at 0 at each site
    f = g.flat()
    expect = []
    for r in range(len(f.ref_order) - 1):
        expect.extend(range(int(f.ref_var_first[r + 1] - f.ref_var_first[r])))
    assert variant_nums == expect


def test_save_load_roundtrip_flat(tmp_path, data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr9")
    p = str(tmp_path / "g.npz")
    g.save(p)  # must not require node materialization
    assert g._ref_nodes is None
    from graphtyper_tpu.graph.graph import Graph

    g2 = Graph.load(p)
    _assert_flat_equal(g.flat(), g2.flat())
    assert g2.check()
