"""Graph construction tests mirroring reference
test/graph/test_constructor.cpp expected node structures."""

import pytest

from graphtyper_tpu.graph.build import construct_graph

FA = "tests/data/index_test.fa"
VCF = "tests/data/index_test.vcf.gz"


def _fa(data_dir):
    return str(data_dir / "index_test.fa")


def _vcf(data_dir):
    return str(data_dir / "index_test.vcf.gz")


def test_chr1(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr1")
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 2
    assert g.ref_nodes[0].out_var_ids == [0, 1]
    assert g.var_nodes[0].out_ref_id == 1
    assert g.var_nodes[1].out_ref_id == 1
    assert g.ref_nodes[1].out_degree == 0
    assert [g.ref_nodes[0].label.order, g.var_nodes[0].label.order, g.ref_nodes[1].label.order] == [1, 37, 38]
    assert g.ref_nodes[0].label.dna == b"AGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTT"
    assert g.var_nodes[0].label.dna == b"C"
    assert g.var_nodes[1].label.dna == b"G"
    assert g.ref_nodes[1].label.dna == b"CCCAGGTTTCCCCAGGTTTCCCCTTTGGA"
    assert g.get_all_ref() == g.reference


def test_chr2(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr2")
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 4
    assert g.ref_nodes[0].out_var_ids == [0, 1]
    assert g.ref_nodes[1].out_var_ids == [2, 3]
    assert [n.label.order for n in g.ref_nodes] == [1, 3, 4]
    assert [n.label.order for n in g.var_nodes] == [2, 2, 3, 3]
    assert g.ref_nodes[0].label.dna == b"C"
    assert g.var_nodes[0].label.dna == b"C"
    assert g.var_nodes[1].label.dna == b"A"
    assert g.ref_nodes[1].label.dna == b""
    assert g.var_nodes[2].label.dna == b"C"
    assert g.var_nodes[3].label.dna == b"A"
    assert g.ref_nodes[2].label.dna == b"CAGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTTGGACCC"


def test_chr3_multiallelic_and_special_pos(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr3")
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3
    assert g.ref_nodes[0].out_var_ids == [0, 1, 2]
    assert [n.label.order for n in g.var_nodes] == [31, 31, 31]
    assert g.ref_nodes[0].label.dna == b"AAAACAAAATAAAACAAAATAAAAGAAAAC"
    assert g.ref_nodes[1].label.dna == b"AAATAAAACAAAATAAAAGAAAACATTATAAAACA"
    assert g.var_nodes[0].label.dna == b"A"
    assert g.var_nodes[1].label.dna == b"G"
    assert g.var_nodes[2].label.dna == b"GA"
    # special positions: var 'GA' reaches one past the ref allele
    assert g.actual_poses == [32]
    assert g.ref_reach_poses == [31]
    assert list(g.ref_reach_to_special_pos.keys()) == [31]


def test_chr8_overlapping_indels_partial_region(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr8:1-56")
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 2
    assert [g.ref_nodes[0].label.order, g.var_nodes[0].label.order, g.ref_nodes[1].label.order] == [1, 39, 57]
    assert g.ref_nodes[0].label.dna == b"TGCAAATCTCATATATATATATATATATATATATATAT"
    assert g.ref_nodes[1].label.dna == b""
    assert g.var_nodes[0].label.dna == b"ATATATATTTTTTTTTTT"
    assert g.var_nodes[1].label.dna == b"A"
    assert g.actual_poses == []


def test_chr9_anti_events(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr9", add_all_variants=True)
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 4
    assert g.var_nodes[0].events == {-1}
    assert g.var_nodes[1].events == {1}
    assert g.var_nodes[2].events == {-2}
    assert g.var_nodes[3].events == {2}
    assert g.var_nodes[0].anti_events == set()
    assert g.var_nodes[1].anti_events == {2}
    assert g.var_nodes[2].anti_events == set()
    assert g.var_nodes[3].anti_events == set()


def test_chr10_events(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr10", add_all_variants=True)
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 4
    assert g.var_nodes[1].events == {1}
    assert all(len(v.anti_events) == 0 for v in g.var_nodes)


def test_chr11_anti_event_merge(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr11", add_all_variants=True)
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 6


def test_sv_graph_chr5_deletion(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr5", is_sv_graph=True)
    assert len(g.svs) == 1
    assert g.svs[0].model == "BREAKPOINT"
    # deletion breakpoint alt carries the SV tag
    tagged = [v for v in g.var_nodes if b"<SV:0000000>" in v.label.dna]
    assert len(tagged) == 1
    assert g.check()


def test_sv_graph_chr6_dup_and_inv(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr6", is_sv_graph=True)
    # DUP at 70 (breakpoints 1+2) and INV at 207
    assert len(g.svs) >= 3
    assert g.check()


def test_serialization_roundtrip(tmp_path, data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr3")
    p = str(tmp_path / "g.npz")
    g.save(p)
    from graphtyper_tpu.graph.graph import Graph

    g2 = Graph.load(p)
    assert g2.size() == g.size()
    assert g2.genomic_region.chr == "chr3"
    assert [n.label.dna for n in g2.var_nodes] == [n.label.dna for n in g.var_nodes]
    assert [n.label.order for n in g2.ref_nodes] == [n.label.order for n in g.ref_nodes]
    assert g2.ref_reach_poses == g.ref_reach_poses
    assert g2.get_all_ref() == g.get_all_ref()


def test_finalize_tensors(data_dir):
    g = construct_graph(_fa(data_dir), _vcf(data_dir), "chr3")
    t = g.finalize()
    assert t.site_num_alleles.tolist() == [3]
    assert t.site_order.tolist() == [31]
    assert t.var_dna_len.tolist() == [1, 1, 2]
