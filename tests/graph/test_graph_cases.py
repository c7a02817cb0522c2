"""Golden ports of reference test/graph/test_graph.cpp construction cases
(raw add_genomic_region semantics: N handling, variant-at-start, overlap
merging)."""

from graphtyper_tpu.graph.coords import GenomicRegion
from graphtyper_tpu.graph.graph import Graph
from graphtyper_tpu.graph.records import Allele, VarRecord


def _rec(pos, ref, alts):
    return VarRecord(pos=pos, ref=Allele(ref), alts=[Allele(a) for a in alts])


def _build(reference, records, add_all_variants=False):
    g = Graph()
    g.add_genomic_region(reference, records, GenomicRegion(), add_all_variants=add_all_variants)
    return g


def _build_region(reference, records, region, add_all_variants=False):
    g = Graph()
    g.add_genomic_region(reference, records, region, add_all_variants=add_all_variants)
    return g


def test_reference_can_contain_ns():
    # test_graph.cpp:297-392
    g = _build(b"ACCGNGAAAA", [_rec(3, b"G", [b"GT"]), _rec(6, b"A", [b"AT", b"G"])])
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 5
    assert g.ref_nodes[0].out_var_ids == [0, 1]
    assert g.var_nodes[0].out_ref_id == 1
    assert g.var_nodes[1].out_ref_id == 1
    assert g.ref_nodes[1].out_var_ids == [2, 3, 4]
    assert all(g.var_nodes[v].out_ref_id == 2 for v in (2, 3, 4))
    assert g.ref_nodes[2].out_degree == 0
    assert [g.ref_nodes[i].label.order for i in range(3)] == [1, 5, 8]
    assert [g.var_nodes[i].label.order for i in range(5)] == [4, 4, 7, 7, 7]
    assert g.ref_nodes[0].label.dna == b"ACC"
    assert g.var_nodes[0].label.dna == b"G"
    assert g.var_nodes[1].label.dna == b"GT"
    assert g.ref_nodes[1].label.dna == b"NG"
    assert g.var_nodes[2].label.dna == b"A"
    assert g.var_nodes[3].label.dna == b"AT"
    assert g.var_nodes[4].label.dna == b"G"
    assert g.ref_nodes[2].label.dna == b"AAA"


def test_graph_can_start_with_variant():
    # test_graph.cpp:225-296
    g = _build(b"ACCGGGAAAA", [_rec(0, b"A", [b"C"]), _rec(6, b"A", [b"AT", b"G"])])
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 5
    assert g.ref_nodes[0].label.dna == b""
    assert [g.var_nodes[0].label.dna, g.var_nodes[1].label.dna] == [b"A", b"C"]
    assert g.ref_nodes[1].label.dna == b"CCGGG"
    assert [g.var_nodes[i].label.dna for i in (2, 3, 4)] == [b"A", b"AT", b"G"]
    assert g.ref_nodes[2].label.dna == b"AAA"
    assert [g.ref_nodes[i].label.order for i in range(3)] == [1, 2, 8]
    assert [g.var_nodes[i].label.order for i in range(5)] == [1, 1, 7, 7, 7]


REF_N = (
    b"GCTGCGGCGGGCGTCGCGGCCGCCCCCGGGGAGCCCGGCGGGCGCCGGCGCG"
    b"NCCCCCCCCCCACCCCACGTCTCGTCGCGCGCGC"
)


def test_variant_ref_allele_with_n_dropped():
    # test_graph.cpp:1436-1470 — ref allele contains N: nothing is added
    g = _build(REF_N, [_rec(51, b"GN", [b"GA"])], add_all_variants=True)
    assert len(g.ref_nodes) == 1
    assert g.ref_nodes[0].label.dna == REF_N
    assert len(g.var_nodes) == 0


def test_variant_alt_allele_with_n_dropped():
    # test_graph.cpp:1472-1500 — only the N-containing alt is dropped
    g = _build(REF_N, [_rec(51, b"G", [b"GN", b"GA"])], add_all_variants=True)
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 2
    assert g.var_nodes[0].label.dna == b"G"
    assert g.var_nodes[1].label.dna == b"GA"


def test_variant_all_alts_with_n_removes_variant():
    # test_graph.cpp:1501-1520
    g = _build(REF_N, [_rec(51, b"G", [b"GN", b"GNA"])], add_all_variants=True)
    assert len(g.ref_nodes) == 1
    assert len(g.var_nodes) == 0


def test_two_adjacent_variants_join_under_add_all():
    # G>T at pos 2 and C>G,T at pos 3 under add-all-variants: the LIVE merge
    # path (graph.cpp:89-167, MAX_VAR_MERGE_DIST) joins them into one site
    # enumerating all 6 two-base haplotypes. (test_graph.cpp:714's
    # kept-separate expectation is commented out upstream.)
    g = _build(b"ACGCTAA", [_rec(2, b"G", [b"T"]), _rec(3, b"C", [b"G", b"T"])], add_all_variants=True)
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 6
    assert g.ref_nodes[0].label.dna == b"AC"
    assert {v.label.dna for v in g.var_nodes} == {b"GC", b"GG", b"GT", b"TC", b"TG", b"TT"}
    assert g.ref_nodes[1].label.dna == b"TAA"


def test_overlapping_variants_merge():
    # test_graph.cpp:553-628 — GGT>T deletion overlapping a G>AT indel merges
    # into one site with exact node labels
    g = _build(b"ACGGTAA", [_rec(2, b"GGT", [b"T"]), _rec(3, b"G", [b"AT"])])
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3
    assert g.ref_nodes[0].out_var_ids == [0, 1, 2]
    assert all(v.out_ref_id == 1 for v in g.var_nodes)
    assert g.ref_nodes[0].label.order == 1
    assert all(v.label.order == 3 for v in g.var_nodes)
    assert g.ref_nodes[1].label.order == 6
    assert g.ref_nodes[0].label.dna == b"AC"
    assert g.var_nodes[0].label.dna == b"GGT"
    assert g.var_nodes[1].label.dna == b"GATT"
    assert g.var_nodes[2].label.dna == b"T"
    assert g.ref_nodes[1].label.dna == b"AA"


def test_reference_can_start_with_ns():
    # test_graph.cpp:393-468
    g = _build(b"NNCGGGAAAA", [_rec(6, b"A", [b"AT", b"G"])])
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3
    assert g.ref_nodes[0].label.dna == b"NNCGGG"
    assert [g.var_nodes[i].label.dna for i in range(3)] == [b"A", b"AT", b"G"]
    assert g.ref_nodes[1].label.dna == b"AAA"


def test_overlap_second_variant_reaches_further():
    # test_graph.cpp:629-713 — GGT>T and GTA>C merge; exact node labels
    g = _build(b"ACGGTAA", [_rec(2, b"GGT", [b"T"]), _rec(3, b"GTA", [b"C"])])
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3
    assert g.ref_nodes[0].out_var_ids == [0, 1, 2]
    assert g.ref_nodes[0].label.dna == b"AC"
    assert g.var_nodes[0].label.dna == b"GGTA"
    assert g.var_nodes[1].label.dna == b"GC"
    assert g.var_nodes[2].label.dna == b"TA"
    assert [g.ref_nodes[0].label.order, g.ref_nodes[1].label.order] == [1, 7]
    assert all(v.label.order == 3 for v in g.var_nodes)


def test_two_variants_three_bp_apart_join():
    # test_graph.cpp:811-869 — C>T snp and T>G,A 3bp later joined into one
    # site enumerating all six haplotype sequences
    g = _build(b"ACGCTAA", [_rec(1, b"C", [b"T"]), _rec(4, b"T", [b"G", b"A"])], add_all_variants=True)
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 6
    assert g.ref_nodes[0].label.dna == b"A"
    dnas = {v.label.dna for v in g.var_nodes}
    assert dnas == {b"CGCT", b"CGCG", b"CGCA", b"TGCG", b"TGCA", b"TGCT"}
    assert g.ref_nodes[1].label.dna == b"AA"


def test_four_variants_joined():
    # test_graph.cpp:1118-1235 — a deletion plus three snps (with non-ACGT
    # alt letters a/b/c/d as markers) join into one site whose haplotypes
    # enumerate every combination not summing to the reference
    g = _build(
        b"SGTACGE",
        [
            _rec(1, b"GTACG", [b"G"]),
            _rec(1, b"G", [b"a", b"b"]),
            _rec(2, b"T", [b"c"]),
            _rec(4, b"C", [b"d"]),
        ],
        add_all_variants=True,
    )
    assert g.ref_nodes[0].label.dna == b"S"
    dnas = {v.label.dna for v in g.var_nodes}
    expected = {
        b"G", b"GTACG", b"GTAdG", b"GcACG", b"GcAdG",
        b"aTACG", b"aTAdG", b"acACG", b"acAdG",
        b"bTACG", b"bTAdG", b"bcACG", b"bcAdG",
    }
    assert dnas == expected
    assert g.ref_nodes[1].label.dna == b"E"


def test_start_at_any_reference_location():
    # test_graph.cpp:469-552 — region "chr1:2" shifts contig-local orders
    g = _build_region(
        b"CCGGTAAAT",
        [_rec(3, b"GG", [b"GT"]), _rec(6, b"A", [b"AT", b"G"])],
        GenomicRegion.parse("chr1:2"),
    )
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 5
    assert [g.ref_nodes[i].label.order for i in range(3)] == [2, 6, 8]
    assert [g.var_nodes[i].label.order for i in range(5)] == [4, 4, 7, 7, 7]
    assert g.ref_nodes[0].label.dna == b"CC"
    assert g.var_nodes[0].label.dna == b"GG"
    assert g.var_nodes[1].label.dna == b"GT"
    assert g.ref_nodes[1].label.dna == b"T"
    assert g.var_nodes[2].label.dna == b"A"


def test_three_variants_joined_with_trailing_indel():
    # test_graph.cpp:1236-1345 — deletion + two snps + a GEE>Ge indel join;
    # all listed haplotypes must be enumerated
    g = _build(
        b"SGTACGEEF",
        [
            _rec(1, b"GTACG", [b"G"]),
            _rec(1, b"G", [b"a", b"b"]),
            _rec(2, b"T", [b"c"]),
            _rec(4, b"C", [b"d"]),
            _rec(5, b"GEE", [b"Ge"]),
        ],
        add_all_variants=True,
    )
    assert g.ref_nodes[0].label.dna == b"S"
    dnas = {v.label.dna for v in g.var_nodes}
    for expected in (
        b"GEE", b"GTACGEE", b"GTACGe", b"GTAdGEE", b"GTAdGe",
        b"GcACGEE", b"GcACGe", b"GcAdGEE", b"GcAdGe",
        b"aTACGEE", b"aTACGe", b"aTAdGEE", b"aTAdGe",
    ):
        assert expected in dnas, expected
