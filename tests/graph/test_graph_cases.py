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


def _var_dnas(g):
    return [v.label.dna for v in g.var_nodes]


def test_bases_between_joined_variants():
    # test_graph.cpp:1002-1117 "Same as above but with bases in between"
    g = _build(
        b"GTACE",
        [
            _rec(0, b"GTAC", [b"G"]),
            _rec(0, b"G", [b"a", b"b"]),
            _rec(2, b"A", [b"c", b"d"]),
        ],
        add_all_variants=True,
    )
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 10
    assert g.ref_nodes[0].label.dna == b""
    assert g.ref_nodes[1].label.dna == b"E"
    dnas = set(_var_dnas(g))
    assert {
        b"GTAC", b"GTcC", b"GTdC", b"aTcC", b"aTdC", b"bTcC", b"bTdC",
        b"aTAC", b"bTAC", b"G",
    } <= dnas
    assert g.ref_nodes[0].out_var_ids == list(range(10))
    assert all(v.out_ref_id == 1 for v in g.var_nodes)
    assert g.ref_nodes[0].label.order == 1
    assert all(v.label.order == 1 for v in g.var_nodes)
    assert g.ref_nodes[1].label.order == 5


def test_variant_overlapping_reference_n():
    # test_graph.cpp:1436-1520
    ref = (
        b"GCTGCGGCGGGCGTCGCGGCCGCCCCCGGGGAGCCCGGCGGGCGCCGGCGCG"
        b"NCCCCCCCCCCACCCCACGTCTCGTCGCGCGCGC"
    )
    # ref allele has an N -> record dropped entirely
    g = _build(ref, [_rec(51, b"GN", [b"GA"])], add_all_variants=True)
    assert len(g.ref_nodes) == 1 and len(g.var_nodes) == 0
    assert g.ref_nodes[0].label.dna == ref
    # one alt has an N -> that alt dropped, the other kept
    g = _build(ref, [_rec(51, b"G", [b"GN", b"GA"])], add_all_variants=True)
    assert len(g.ref_nodes) == 2 and len(g.var_nodes) == 2
    assert g.var_nodes[0].label.dna == b"G"
    assert g.var_nodes[1].label.dna == b"GA"
    # all alts have N -> variant removed
    g = _build(ref, [_rec(51, b"G", [b"GN", b"GNN"])], add_all_variants=True)
    assert len(g.ref_nodes) == 1 and len(g.var_nodes) == 0


def test_prior_for_merge_suffix():
    # test_graph.cpp:1521-1574 "Prior test for the next"
    g = _build(b"GTTCAATG", [_rec(2, b"TC", [b"T"]), _rec(4, b"A", [b"T"])])
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 4
    assert [r.label.dna for r in g.ref_nodes] == [b"GT", b"", b"ATG"]
    assert _var_dnas(g) == [b"TC", b"T", b"A", b"T"]


def test_merge_one_path_removes_variant_suffix():
    # test_graph.cpp:1575-1626
    g = _build(
        b"STAAAAAATF",
        [_rec(1, b"TAAAAAAT", [b"TAAAAAT"]), _rec(7, b"A", [b"T"])],
    )
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 4
    assert g.ref_nodes[0].label.dna == b"S"
    assert g.ref_nodes[1].label.dna == b"TF"
    dnas = set(_var_dnas(g))
    assert {b"TAAAAAA", b"TAAAAA", b"TAAAAAT", b"TAAAAT"} <= dnas


def test_merge_one_path_connected_indel_snp():
    # test_graph.cpp:1627-1676
    g = _build(b"STAAF", [_rec(2, b"AA", [b"T"]), _rec(3, b"A", [b"T"])])
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3
    assert g.ref_nodes[0].label.dna == b"ST"
    assert g.ref_nodes[1].label.dna == b"F"
    assert _var_dnas(g) == [b"AA", b"AT", b"T"]


def test_merge_three_pairs_of_connected_snps():
    # test_graph.cpp:1677-1736
    g = _build(
        b"STAAAF",
        [_rec(2, b"A", [b"T"]), _rec(3, b"A", [b"T"]), _rec(4, b"A", [b"T"])],
    )
    assert len(g.ref_nodes) == 4
    assert len(g.var_nodes) == 6
    assert [r.label.dna for r in g.ref_nodes] == [b"ST", b"", b"", b"F"]
    assert _var_dnas(g) == [b"A", b"T", b"A", b"T", b"A", b"T"]


def test_two_overlapping_indels():
    # test_graph.cpp:1737-1786
    g = _build(
        b"TGCAAATCTCATATATATATATATATATATATATATATATATATATTTTTTTTTTTTTTTTTTTTTTTTTA",
        [
            _rec(30, b"ATATATATATATATATTTTTTTTTTTT", [b"A"]),
            _rec(38, b"ATATATATTTTTTTTTTT", [b"A"]),
        ],
    )
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3
    assert g.ref_nodes[0].label.dna == b"TGCAAATCTCATATATATATATATATATAT"
    assert g.ref_nodes[1].label.dna == b"TTTTTTTTTTTTTA"
    assert _var_dnas(g) == [b"ATATATATATATATATTTTTTTTTTTT", b"A", b"ATATATATAT"]


def test_two_deletions_one_overlapping_snps():
    # test_graph.cpp:1787-1886
    g = _build(
        b"SGTATATAGCTGCCGCCGTTTTTATTACCGGGGGTAGTAGTAGTAGCGCAGAGGTTTTAGAGGGCF",
        [
            _rec(1, b"GT", [b"G"]),
            _rec(1, b"GTATATAGCTGCCGCCGTTT", [b"G"]),
            _rec(9, b"C", [b"a", b"b"]),
            _rec(11, b"G", [b"c", b"d"]),
        ],
    )
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 11
    assert g.ref_nodes[0].out_var_ids == list(range(11))
    assert all(v.out_ref_id == 1 for v in g.var_nodes)
    assert g.ref_nodes[0].label.order == 1
    assert all(v.label.order == 2 for v in g.var_nodes)
    assert g.ref_nodes[1].label.order == 22
    assert g.ref_nodes[0].label.dna == b"S"
    dnas = set(_var_dnas(g))
    assert {
        b"G",
        b"GATATAGCTGCCGCCGTTT",
        b"GATATAGCTcCCGCCGTTT",
        b"GATATAGCTdCCGCCGTTT",
        b"GATATAGaTGCCGCCGTTT",
        b"GATATAGbTGCCGCCGTTT",
        b"GTATATAGCTcCCGCCGTTT",
        b"GTATATAGCTdCCGCCGTTT",
        b"GTATATAGaTGCCGCCGTTT",
        b"GTATATAGbTGCCGCCGTTT",
    } <= dnas
    assert g.ref_nodes[1].label.dna == b"TTATTACCGGGGGTAGTAGTAGTAGCGCAGAGGTTTTAGAGGGCF"


def test_no_two_events_summing_to_reference():
    # test_graph.cpp:1980-2051: the insertion C->CT and the deletion TT->T
    # would jointly spell the reference; ambiguity extension prevents it
    from graphtyper_tpu.graph.build import extend_record_while_ambiguous

    ref = b"TTACTTTTTTAA"
    records = [_rec(3, b"C", [b"CT"]), _rec(7, b"TT", [b"T"])]
    for r in records:
        extend_record_while_ambiguous(r, ref, 0)
    g = _build(ref, records, add_all_variants=True)
    dnas = set(_var_dnas(g))
    assert b"CT" in dnas and b"C" in dnas and b"CTT" in dnas
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 3


def _rec_ev(pos, ref, alts):
    """VarRecord with Allele objects carrying events/anti_events."""
    return VarRecord(pos=pos, ref=ref, alts=alts)


def test_anti_events():
    # test_graph.cpp:2052-2117 — alleles that carry anti-events refuse to
    # combine with the anti-phased alts during the add-all join
    r1 = VarRecord(pos=18, ref=Allele(b"AGTC"), alts=[Allele(b"AG", anti_events={2, 3})])
    r2 = VarRecord(pos=20, ref=Allele(b"T"), alts=[Allele(b"A", events={2}, anti_events={3})])
    r3 = VarRecord(pos=21, ref=Allele(b"C"), alts=[Allele(b"T", events={3})])
    g = _build(b"TTACTTTATAAATTACTCAGTCTCGGGTATGTCC", [r1, r2, r3], add_all_variants=True)
    dnas = set(_var_dnas(g))
    assert {b"AG", b"AGTC", b"AGAC", b"AGTT"} <= dnas
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 4


def test_anti_events_complex():
    # test_graph.cpp:2123-2231
    from graphtyper_tpu.graph.build import extend_record_while_ambiguous

    ref = b"TCTATTTTTTTTTTTTTTTTTTTTTTGA"
    records = [
        VarRecord(pos=3, ref=Allele(b"A"),
                  alts=[Allele(b"ATTT", events={3}, anti_events={4, 5, 6, 7, 8})]),
        VarRecord(pos=11, ref=Allele(b"T"),
                  alts=[Allele(b"TA", events={4}, anti_events={5, 6, 7, 8})]),
        VarRecord(pos=15, ref=Allele(b"T"),
                  alts=[Allele(b"C", events={5}, anti_events={6, 7, 8})]),
        VarRecord(pos=24, ref=Allele(b"T"),
                  alts=[Allele(b"TTG", events={6}, anti_events={7, 8})]),
        VarRecord(pos=25, ref=Allele(b"T"),
                  alts=[Allele(b"TTTG", events={7}, anti_events={8})]),
        VarRecord(pos=26, ref=Allele(b"G"), alts=[Allele(b"T", events={8})]),
    ]
    for r in records:
        extend_record_while_ambiguous(r, ref, 0)
    g = _build(ref, records, add_all_variants=True)
    dnas = set(_var_dnas(g))
    assert {
        b"ATTTTTTTTTTTTTTTTTTTTTTG",
        b"ATTTTTTTTTTTTTTTTTTTTTTT",
        b"ATTTTTTTTTTTTTTTTTTTTTTTTGG",
        b"ATTTTTTTTTTTTTTTTTTTTTTGTG",
        b"ATTTTTTTTTTTCTTTTTTTTTTG",
        b"ATTTTTTTTATTTTTTTTTTTTTTG",
        b"ATTTTTTTTTTTTTTTTTTTTTTTTTG",
    } <= dnas
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 7


def test_parity_events():
    # test_graph.cpp:2237-2323 — negative (reference-side) events keep
    # ref/alt parity through the join
    from graphtyper_tpu.graph.build import extend_record_while_ambiguous

    ref = b"TCTATTTTTTTTTTTTTTTTTTTTTTGA"
    records = [
        VarRecord(pos=3, ref=Allele(b"A", events={-2}, anti_events={4}),
                  alts=[Allele(b"ATT", events={2}, anti_events={3, -4})]),
        VarRecord(pos=3, ref=Allele(b"A", events={-3}),
                  alts=[Allele(b"ATTT", events={3}, anti_events={4})]),
        VarRecord(pos=11, ref=Allele(b"T", events={-4}),
                  alts=[Allele(b"TA", events={4})]),
    ]
    for r in records:
        extend_record_while_ambiguous(r, ref, 0)
    g = _build(ref, records, add_all_variants=True)
    dnas = _var_dnas(g)
    assert dnas[0] == b"ATTTTTTTT"  # reference allele first
    assert b"ATTTTTTTTTTT" in dnas
    assert b"ATTTTTTTTA" in dnas
    assert b"ATTTTTTTTTTA" in dnas
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 4


def test_parity_events_adjacent_snps():
    # test_graph.cpp:2330-2440 — three adjacent SNPs with full parity event
    # bookkeeping collapse to two haplotype alleles with merged event sets
    from graphtyper_tpu.graph.build import extend_record_while_ambiguous

    ref = b"TCTCAGA"
    records = [
        VarRecord(pos=3, ref=Allele(b"C", events={-1}, anti_events={2, 3}),
                  alts=[Allele(b"T", events={1}, anti_events={-2, -3})]),
        VarRecord(pos=4, ref=Allele(b"A", events={-2}, anti_events={3}),
                  alts=[Allele(b"G", events={2}, anti_events={-3})]),
        VarRecord(pos=5, ref=Allele(b"G", events={-3}),
                  alts=[Allele(b"A", events={3})]),
    ]
    for r in records:
        extend_record_while_ambiguous(r, ref, 0)
    g = _build(ref, records, add_all_variants=True)
    assert len(g.ref_nodes) == 2
    assert len(g.var_nodes) == 2
    ref_node, alt_node = g.var_nodes
    assert ref_node.label.dna == b"CAG"
    assert ref_node.events == {-1, -2, -3}
    assert ref_node.anti_events == {2, 3}
    assert alt_node.label.dna == b"TGA"
    assert alt_node.events == {1, 2, 3}
    assert alt_node.anti_events == {-2, -3}


def test_get_reference_sequence_of_graph():
    # test_graph.cpp:29-97 — five overlapping/merged records; the original
    # reference sequence must survive through the merged graph
    g = _build(
        b"SGTACGEEF",
        [
            _rec(1, b"GTACG", [b"G"]),
            _rec(1, b"G", [b"a", b"b"]),
            _rec(2, b"T", [b"c"]),
            _rec(4, b"C", [b"d"]),
            _rec(5, b"GEE", [b"Ge"]),
        ],
    )
    assert g.get_all_ref() == b"SGTACGEEF"


def test_graph_with_reference_only():
    # test_graph.cpp:98-132
    g = _build(b"ACCGGGAAAA", [])
    assert len(g.ref_nodes) == 1
    assert len(g.var_nodes) == 0
    assert g.ref_nodes[0].out_degree == 0
    assert g.ref_nodes[0].label.order == 1
    assert g.ref_nodes[0].label.dna == b"ACCGGGAAAA"
    assert g.get_all_ref() == b"ACCGGGAAAA"


def test_graph_with_two_variant_records():
    # test_graph.cpp:133-224
    g = _build(b"ACCGGGAAAA", [_rec(3, b"G", [b"GT"]), _rec(6, b"A", [b"AT", b"G"])])
    assert len(g.ref_nodes) == 3
    assert len(g.var_nodes) == 5
    assert g.ref_nodes[0].out_var_ids == [0, 1]
    assert g.var_nodes[0].out_ref_id == 1
    assert g.var_nodes[1].out_ref_id == 1
    assert g.ref_nodes[1].out_var_ids == [2, 3, 4]
    assert all(g.var_nodes[v].out_ref_id == 2 for v in (2, 3, 4))
    assert g.ref_nodes[2].out_degree == 0
    assert [r.label.order for r in g.ref_nodes] == [1, 5, 8]
    assert [v.label.order for v in g.var_nodes] == [4, 4, 7, 7, 7]
    assert g.ref_nodes[0].label.dna == b"ACC"
    assert _var_dnas(g) == [b"G", b"GT", b"A", b"AT", b"G"]
    assert g.ref_nodes[1].label.dna == b"GG"
    assert g.ref_nodes[2].label.dna == b"AAA"
