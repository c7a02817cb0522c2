"""Tests for the legacy discovery producer (haplotype_extractor) and the
VariantMap candidate store (variant_map.cpp / variant_support.cpp)."""

import pytest

from graphtyper_tpu.constants import IS_LOW_BASE_QUAL, IS_PROPER_PAIR, IS_REVERSED
from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.typer.haplotype_extractor import (
    extract_sequences_from_aligned_variant,
    find_variants_in_alignment,
    get_gapped_strings,
    make_variant_of_gapped_strings,
)
from graphtyper_tpu.typer.variant_map import VariantCandidate, VariantMap, VariantSupport


def _graph(data_dir):
    return construct_graph(str(data_dir / "index_test.fa"), None, "chr1")


def test_gapped_strings_perfect_match_rejected():
    ref = b"ACGTACGTACGTACGTACGTACGTACGT"
    assert get_gapped_strings(ref, ref) is None


def test_gapped_strings_low_score_rejected():
    # rejects score < 42 (haplotype_extractor.cpp:112)
    assert get_gapped_strings(b"ACGTACGTAC", b"TTTTTTTTTT") is None


def test_gapped_strings_snp():
    ref = b"ACGTACGTACGTACGTACGTACGTACGTACGT"
    seq = bytearray(ref)
    seq[15] = ord("G") if seq[15] != ord("G") else ord("C")
    out = get_gapped_strings(ref, bytes(seq))
    assert out is not None
    g_ref, g_seq = out
    assert g_ref.replace("-", "") == ref.decode()
    assert g_seq.replace("-", "") == bytes(seq).decode()
    diffs = [i for i, (a, b) in enumerate(zip(g_ref, g_seq)) if a != b]
    assert len(diffs) == 1


def test_gapped_strings_deletion():
    ref = b"ACGTAACCGGTTACGTAACCGGTTACGTAACCGGTT"
    seq = ref[:16] + ref[20:]  # 4bp deletion
    out = get_gapped_strings(ref, seq)
    assert out is not None
    g_ref, g_seq = out
    assert g_ref.replace("-", "") == ref.decode()
    assert g_seq.count("-") >= 4


def test_make_variant_of_gapped_strings_snp():
    #        0123456789
    g_ref = "ACGTACGTAC"
    g_alt = "ACGTTCGTAC"
    out = make_variant_of_gapped_strings(g_ref, g_alt, 100)
    assert out is not None
    pos, ref, alt, _off = out
    # spans from one base before the first mismatch to the alignment end;
    # minimal-form trimming happens later in the splitter
    assert (pos, ref, alt) == (103, b"TACGTAC", b"TTCGTAC")


def test_make_variant_no_variant():
    assert make_variant_of_gapped_strings("ACGT", "ACGT", 100) is None


def test_extract_split_on_threshold():
    # two SNPs separated by >= SPLIT_VAR_THRESHOLD(5) matching bases split
    # into two records (variant.cpp:1715)
    g_ref = "AACGTACGTACCA"
    g_alt = "ATCGTACGTACGA"
    out = extract_sequences_from_aligned_variant(100, [g_ref, g_alt], threshold=5)
    assert len(out) == 2
    (p1, s1), (p2, s2) = out
    assert p1 == 101 and s1 == [b"A", b"T"]
    assert p2 == 111 and s2 == [b"C", b"G"]


def test_extract_keeps_close_snps_together():
    g_ref = "AACGTA"
    g_alt = "ATCGTT"
    out = extract_sequences_from_aligned_variant(100, [g_ref, g_alt], threshold=5)
    assert len(out) == 1
    pos, seqs = out[0]
    assert pos == 101
    assert seqs == [b"ACGTA", b"TCGTT"]


def test_find_variants_in_alignment_snp(data_dir):
    g = _graph(data_dir)
    ref = bytes(g.reference[:60])
    seq = bytearray(ref[10:55])
    seq[20] = ord("A") if seq[20] != ord("A") else ord("C")
    qual = bytes([ord("I")] * len(seq))
    cands = find_variants_in_alignment(g, 11, ref, bytes(seq), qual)
    assert len(cands) == 1
    c = cands[0]
    assert c.seqs[0] != c.seqs[1]
    assert len(c.seqs[0]) == 1 and len(c.seqs[1]) == 1
    # chr1 is the first contig: abs = local; SNP at local pos 1+10+20
    assert c.abs_pos == 31
    assert not (c.flags & IS_LOW_BASE_QUAL)


def test_find_variants_flags_low_qual(data_dir):
    g = _graph(data_dir)
    ref = bytes(g.reference[:60])
    seq = bytearray(ref[10:55])
    seq[20] = ord("A") if seq[20] != ord("A") else ord("C")
    qual = bytes([33 + 20] * len(seq))  # all quals 20 <= 25
    cands = find_variants_in_alignment(g, 11, ref, bytes(seq), qual)
    assert len(cands) == 1
    assert cands[0].flags & IS_LOW_BASE_QUAL


# ----------------------------------------------------------------------
# VariantMap / VariantSupport


def _mk_cand(pos=1000, ref=b"A", alt=b"C", flags=0):
    c = VariantCandidate(abs_pos=pos, original_pos=pos, seqs=[ref, alt], flags=flags)
    return c


def test_variant_support_cutoffs():
    sup = VariantSupport(hq_support=5, proper_pairs=3, depth=10,
                         first_in_pairs=2, sequence_reversed=3, clipped=0)
    sup.unique_positions = {1, 2, 3}
    sup.is_any_mapq_good = True
    assert sup.is_support_above_cutoff(5)
    assert not sup.is_support_above_cutoff(9)
    assert sup.get_ratio() > 0.25


def test_variant_support_strand_bias_rejected():
    # all-forward, non-promising: strand bias gate fires
    sup = VariantSupport(hq_support=3, proper_pairs=2, depth=10,
                         first_in_pairs=1, sequence_reversed=0, clipped=0)
    sup.unique_positions = {1, 2}
    sup.is_any_mapq_good = True
    assert not sup.is_support_above_cutoff(3)


def test_variant_map_pooling(data_dir):
    g = _graph(data_dir)
    vm = VariantMap(n_samples=2, minimum_variant_support=3)
    vm.set_samples(["s1", "s2"])
    flags = IS_PROPER_PAIR
    for i in range(8):
        fl = flags | (IS_REVERSED if i % 2 else 0)
        c = _mk_cand(flags=fl)
        c.original_pos = 1000 + i  # unique start positions
        vm.add_variants(g, [c], 0)
    vm.create_varmap_for_all(None)
    assert len(vm.pool_varmap) == 1
    sups = next(iter(vm.pool_varmap.values()))
    assert sups[0].depth == 8
    assert sups[0].hq_support == 8
    assert sups[0].sequence_reversed == 4
    vm.filter_varmap_for_all(g)
    assert len(vm.pool_varmap) == 1
    out = vm.get_variants()
    assert out[0].abs_pos == 1000


def test_variant_map_save_load(tmp_path, data_dir):
    g = _graph(data_dir)
    vm = VariantMap(n_samples=1)
    for i in range(6):
        c = _mk_cand(flags=IS_PROPER_PAIR | (IS_REVERSED if i % 2 else 0))
        c.original_pos = 1000 + i
        vm.add_variants(g, [c], 0)
    vm.create_varmap_for_all(None)
    p = str(tmp_path / "vm.pkl")
    vm.save(p)
    vm2 = VariantMap.load(p)
    assert len(vm2.pool_varmap) == len(vm.pool_varmap)
    assert vm2.get_variants() == vm.get_variants()
