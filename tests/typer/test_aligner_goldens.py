"""Goldens ported from the reference's legacy-aligner and path tests.

- test/typer/test_gyper_aligner.cpp "GENERAL PURPOSE": k-mer lookups on the
  index_test chr1 graph (common ref k-mer with 3 labels, unique ref k-mer,
  unique variant k-mer, non-existing k-mer). The reference's legacy
  RocksDB aligner used 0-based start/end indexes; our index stores the
  1-based orders of ph_index/test_index.cpp, so the expectations shift +1.
- test/typer/test_path.cpp "Sucessful merging of two paths" (the one live
  section): two reference paths concatenate into one 63bp path.
"""

from graphtyper_tpu.constants import INVALID_ID
from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.typer.path import Path


def to_uint64(s: str) -> int:
    out = 0
    for ch in s:
        out = (out << 2) | "ACGT".index(ch)
    return out


def _chr1(data_dir):
    g = construct_graph(
        str(data_dir / "index_test.fa"), str(data_dir / "index_test.vcf.gz"), "chr1"
    )
    return g, index_graph(g)


def test_common_kmer_on_reference(data_dir):
    # test_gyper_aligner.cpp:40-59 — 3 labels with starts {3,13,23} /
    # ends {34,44,54} (0-based) -> {4,14,24}/{35,45,55} 1-based
    g, idx = _chr1(data_dir)
    labels = idx.get(to_uint64("TTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTT"))
    assert len(labels) == 3
    assert sorted((l[0], l[1]) for l in labels) == [(4, 35), (14, 45), (24, 55)]


def test_unique_kmer_on_reference(data_dir):
    # test_gyper_aligner.cpp:61-74 — start 34 end 65 (0-based) -> 35/66
    g, idx = _chr1(data_dir)
    labels = idx.get(to_uint64("TTCCCCAGGTTTCCCCAGGTTTCCCCTTTGGA"))
    assert len(labels) == 1
    assert (labels[0][0], labels[0][1]) == (35, 66)


def test_unique_kmer_on_variant(data_dir):
    # test_gyper_aligner.cpp:76-88 — the G-allele k-mer maps to the same
    # span through the alt node
    g, idx = _chr1(data_dir)
    labels = idx.get(to_uint64("TTGCCCAGGTTTCCCCAGGTTTCCCCTTTGGA"))
    assert len(labels) == 1
    assert (labels[0][0], labels[0][1]) == (35, 66)
    # the alt path must carry the variant id of the non-ref allele
    assert labels[0][2] != INVALID_ID
    assert g.get_variant_num(g.flat().ref_var_first[0] + labels[0][2]) in (0, 1)


def test_non_existing_kmer(data_dir):
    # test_gyper_aligner.cpp:90-99
    g, idx = _chr1(data_dir)
    assert idx.get(to_uint64("A" * 32)) == []


def test_two_reference_paths_merge(data_dir):
    # test_path.cpp:51-65 — Path(1..32) + Path(32..43) -> size 63,
    # start 1, end 43, no variant sites
    g, _ = _chr1(data_dir)
    p_prev = Path.from_label(g, 1, 32, INVALID_ID, 0, 31)
    p_next = Path.from_label(g, 32, 43, INVALID_ID, 31, 62)
    merged = Path.merge(g, p_prev, p_next)
    assert merged.size() == 63
    assert merged.start == 1
    assert merged.end == 43
    assert merged.var_order == []
    assert merged.nums == []
