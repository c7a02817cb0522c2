"""K-mer index tests mirroring reference test/index/test_index.cpp golden
label counts, start/end indexes, and variant ids."""

import numpy as np

from graphtyper_tpu.constants import INVALID_ID, K, SPECIAL_START
from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.index.kmer_index import hamming1_keys


def to_uint64(s: str) -> int:
    out = 0
    for ch in s:
        out = (out << 2) | "ACGT".index(ch)
    return out


def _index(data_dir, chrom, **kw):
    g = construct_graph(str(data_dir / "index_test.fa"), str(data_dir / "index_test.vcf.gz"), chrom, **kw)
    return g, index_graph(g)


def test_index_chr1(data_dir):
    g, idx = _index(data_dir, "chr1")
    assert g.get_all_ref() == b"AGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTTTCCCCTTTGGA"

    l = idx.get(to_uint64("AGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAG"))
    assert len(l) == 3
    assert [(x[0], x[1]) for x in l] == [(1, 32), (11, 42), (21, 52)]
    assert [x[2] for x in l] == [INVALID_ID, 0, 0]

    l = idx.get(to_uint64("AGGTTTCCCCAGGTTTCCCCAGGTTTCCCCTT"))
    assert l == [(31, 62, 0)]

    l = idx.get(to_uint64("TTCCCCAGGTTTCCCCAGGTTTCCCCTTTGGA"))
    assert len(l) == 1

    l = idx.get(to_uint64("GGTTTCCCCAGGTTTCCCCAGGTTTGCCCAGG"))
    assert l == [(12, 43, 1)]


def test_index_chr2(data_dir):
    g, idx = _index(data_dir, "chr2")
    l = idx.get(to_uint64("CCCCAGGTTTCCCCAGGTTTCCCCAGGTTTCC"))
    assert len(l) == 4
    assert [(x[0], x[1]) for x in l] == [(1, 32), (1, 32), (11, 42), (21, 52)]
    assert [x[2] for x in l] == [0, 2, INVALID_ID, INVALID_ID]

    l = idx.get(to_uint64("CCCCAGGTTTCCCCAGGTTTCCCCAGGTTTGG"))
    assert l == [(31, 62, INVALID_ID)]

    assert len(idx.get(to_uint64("CACCAGGTTTCCCCAGGTTTCCCCAGGTTTCC"))) == 2
    assert len(idx.get(to_uint64("CCACAGGTTTCCCCAGGTTTCCCCAGGTTTCC"))) == 2
    assert len(idx.get(to_uint64("CAACAGGTTTCCCCAGGTTTCCCCAGGTTTCC"))) == 2


def test_index_chr3_special_positions(data_dir):
    g, idx = _index(data_dir, "chr3")
    # crosses the site via the ref allele -> carries the ref var-node id 0
    l0 = idx.get(to_uint64("AAAACAAAATAAAACAAAATAAAAGAAAACAA"))
    assert l0 == [(1, 32, 0)]

    l1 = idx.get(to_uint64("AAAACAAAATAAAACAAAATAAAAGAAAACGA"))
    assert len(l1) == 2
    assert l1[0] == (1, SPECIAL_START, 2)
    assert l1[1] == (1, 32, 1)

    l2 = idx.get(to_uint64("AAAATAAAACAAAATAAAAGAAAACATTATAA"))
    assert len(l2) == 2
    assert l2[0] == (31, 62, 0)
    assert l2[1] == (SPECIAL_START, 62, 2)

    l3 = idx.get(to_uint64("AAATAAAACAAAATAAAAGAAAACATTATAAA"))
    assert l3 == [(32, 63, INVALID_ID)]


def test_index_chr4_with_Ns(data_dir):
    g, idx = _index(data_dir, "chr4")
    assert g.get_all_ref() == b"AAAACAAAATAAAACAAAATAAAAGAAAACAAAATAAAACAAAATAANNNNNNNNNNNNNNNNNNN"
    l0 = idx.get(to_uint64("AAAACAAAATAAAACAAAATAAAAGAAAACAA"))
    assert l0 == [(1, 32, 0)]
    l1 = idx.get(to_uint64("ATAACAAAATAAAACAAAATAAAAGAAAACAA"))
    assert l1 == [(1, 32, 1)]


def test_index_chr5_sv(data_dir):
    g, idx = _index(data_dir, "chr5", is_sv_graph=True)
    assert len(idx.get(to_uint64("A" * 32))) == 40
    l1 = idx.get(to_uint64("A" * 31 + "G"))
    assert l1 == [(40, SPECIAL_START, 1)]
    l2 = idx.get(to_uint64("A" * 30 + "GG"))
    assert l2 == [(41, SPECIAL_START + 1, 1)]
    l3 = idx.get(to_uint64("A" + "G" * 31))
    assert l3 == [(70, SPECIAL_START + 30, 1)]
    l4 = idx.get(to_uint64("G" * 32))
    assert len(l4) == 2 * (71 - K)
    assert sum(1 for x in l4 if x[0] == SPECIAL_START + 1) == 1
    l6 = idx.get(to_uint64("T" * 32))
    assert len(l6) == 2 * (71 - K)


def test_bulk_matches_generic_walk(data_dir):
    """The vectorized pure-reference fast path must equal a base-by-base walk."""
    import graphtyper_tpu.index.build as ib

    g = construct_graph(str(data_dir / "index_test.fa"), str(data_dir / "index_test.vcf.gz"), "chr3")
    idx_fast = index_graph(g)

    orig = ib.index_reference_label

    def slow(em, mers, order, codes):
        ib._walk_ref(em, mers, order, codes, 0, len(codes))

    ib.index_reference_label = slow
    try:
        idx_slow = index_graph(g)
    finally:
        ib.index_reference_label = orig

    assert np.array_equal(idx_fast.keys, idx_slow.keys)
    assert np.array_equal(idx_fast.offsets, idx_slow.offsets)
    assert np.array_equal(idx_fast.label_start, idx_slow.label_start)
    assert np.array_equal(idx_fast.label_end, idx_slow.label_end)
    assert np.array_equal(idx_fast.label_var_id, idx_slow.label_var_id)


def test_multi_get_and_hamming(data_dir):
    g, idx = _index(data_dir, "chr1")
    q = np.array([to_uint64("AGGTTTCCCCAGGTTTCCCCAGGTTTCCCCAG"), 12345], dtype=np.uint64)
    b, e = idx.multi_get(q)
    assert (e - b).tolist() == [3, 0]
    # hamming-1 of the ref kmer includes the alt kmer at the variant site
    ref_kmer = to_uint64("GGTTTCCCCAGGTTTCCCCAGGTTTCCCCAGG")
    alt_kmer = to_uint64("GGTTTCCCCAGGTTTCCCCAGGTTTGCCCAGG")
    muts = hamming1_keys(np.array([ref_kmer], dtype=np.uint64))[0]
    assert muts.shape == (96,)
    assert np.uint64(alt_kmer) in muts
    assert np.uint64(ref_kmer) not in muts


def test_index_save_load(tmp_path, data_dir):
    g, idx = _index(data_dir, "chr2")
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    from graphtyper_tpu.index.kmer_index import KmerIndex

    idx2 = KmerIndex.load(p)
    assert np.array_equal(idx2.keys, idx.keys)
    assert np.array_equal(idx2.label_end, idx.label_end)


def test_index_chr9_anti_event():
    """test/index/test_index.cpp "Test index chr9 with anti event": the
    anti-phased SNP+insertion pair must not share a kmer."""
    import pathlib

    data_dir = pathlib.Path(__file__).resolve().parents[1] / "data"
    g, idx = _index(data_dir, "chr9", add_all_variants=True)

    labels = idx.get(to_uint64("G" * 32))
    assert len(labels) == 36

    labels = idx.get(to_uint64("GGGGGAGTGGGGGGGGGGGGGGGGGGGGGGGG"))
    assert len(labels) == 1
    assert labels[0][2] == 3  # the insertion alt

    labels = idx.get(to_uint64("GGGGGGGTGGGGGGGGGGGGGGGGGGGGGGGG"))
    assert len(labels) == 2
    ids = {l[2] for l in labels}
    assert ids == {0, 2}  # the two reference alleles; never the anti pair


def test_index_chr10_parity_event():
    """test/index/test_index.cpp "Test index chr10 with parity event": the
    co-phased (GT_HAPLOTYPE) SNP+insertion kmers include the joint paths."""
    import pathlib

    data_dir = pathlib.Path(__file__).resolve().parents[1] / "data"
    g, idx = _index(data_dir, "chr10", add_all_variants=True)

    labels = idx.get(to_uint64("G" * 32))
    assert len(labels) == 36

    labels = idx.get(to_uint64("GGGGGAGTGGGGGGGGGGGGGGGGGGGGGGGG"))
    assert len(labels) == 1
    assert labels[0][2] == 3

    labels = idx.get(to_uint64("GGGGGGGTGGGGGGGGGGGGGGGGGGGGGGGG"))
    assert len(labels) == 2
    assert {l[2] for l in labels} == {0, 2}

    labels = idx.get(to_uint64("AGGGGGGTGGGGGGGGGGGGGGGGGGGGGGGG"))
    assert len(labels) == 2

    labels = idx.get(to_uint64("AGGGGGAGTGGGGGGGGGGGGGGGGGGGGGGG"))
    assert len(labels) == 2
    assert {l[2] for l in labels} == {1, 3}  # SNP alt + insertion co-phased
