"""Golden ports of the reference's kmer-helper and haplotype unit tests
(test/utilities/test_kmer_help_functions.cpp, test/graph/test_haplotypes.cpp,
test/graph/test_genomic_region.cpp)."""

import numpy as np

from graphtyper_tpu.constants import K
from graphtyper_tpu.graph.coords import AbsolutePosition, Contig
from graphtyper_tpu.typer.alignment import num_kmers, to_uint64_list
from graphtyper_tpu.utils.dna import encode, revcomp_codes, unpack_kmer


def _keys(seq: str, i: int) -> list[str]:
    keys = to_uint64_list(encode(seq), i)
    return [unpack_kmer(k, K) for k in keys]


def test_num_kmers():
    # test_kmer_help_functions.cpp:20-45
    assert num_kmers(len("AAAACAAAAGAAAACAAAAGAAAACAAAAGAT")) == 1
    assert num_kmers(62) == 1
    assert num_kmers(63) == 2
    assert num_kmers(64) == 2
    assert num_kmers(93) == 2
    assert num_kmers(94) == 3
    assert num_kmers(95) == 3


def test_iupac_fork_n():
    # test_kmer_help_functions.cpp:73-86 — exact ACGT substring and key order
    read = "ACCGGGGTTAAAATTGAAAACCCCTAAAATTGAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    assert _keys(read, 0) == ["ACCGGGGTTAAAATTGAAAACCCCTAAAATTG"]
    assert _keys(read, 10) == ["AAATTGAAAACCCCTAAAATTGAAAAAAAAAA"]


def test_iupac_fork_one_and_two_non_acgt():
    # test_kmer_help_functions.cpp:88-111 — N forks 4 (order T,A,C,G), W forks
    # 2 (T,A), B forks 3 (T,C,G)
    read = (
        "ACCGGGGTTAAAATTGAAAACCCCTAAAATTNAAAAAAAAAAAAAAAAAAAAAAAAA"
        "WAAAAAAAAAATTTTTTTBTTTTTTTTTTTTTTTTTTT"
    )
    assert _keys(read, 0) == [
        "ACCGGGGTTAAAATTGAAAACCCCTAAAATTT",
        "ACCGGGGTTAAAATTGAAAACCCCTAAAATTA",
        "ACCGGGGTTAAAATTGAAAACCCCTAAAATTC",
        "ACCGGGGTTAAAATTGAAAACCCCTAAAATTG",
    ]
    assert _keys(read, 32) == [
        "AAAAAAAAAAAAAAAAAAAAAAAAATAAAAAA",
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
    ]
    assert _keys(read, 63) == [
        "AAAAATTTTTTTTTTTTTTTTTTTTTTTTTTT",
        "AAAAATTTTTTTCTTTTTTTTTTTTTTTTTTT",
        "AAAAATTTTTTTGTTTTTTTTTTTTTTTTTTT",
    ]


def test_iupac_many_ns_gives_no_keys():
    # test_kmer_help_functions.cpp:113-118 — 12 Ns exceed the 97-key cap
    read = "NNNNNNNNNNNNAAAAAAAAAAAAAAAAAAAAAA"
    assert to_uint64_list(encode(read), 0) == []


def test_iupac_revcomp_codes():
    codes = encode("ARYSWKMBDHVN")
    rc = revcomp_codes(codes)
    # complemented sets: A->T, R(AG)->Y(CT), Y->R, S->S, W->W, K(GT)->M(AC),
    # M->K, B(CGT)->V(ACG), D(AGT)->H(ACT), H->D, V->B, N->N; then reversed
    from graphtyper_tpu.utils.dna import IUPAC_SETS_BY_CODE

    fwd_sets = [IUPAC_SETS_BY_CODE[c] for c in codes]
    rc_sets = [IUPAC_SETS_BY_CODE[c] for c in rc]
    for f, r in zip(fwd_sets, reversed(rc_sets)):
        assert sorted(3 - b for b in f) == list(r)


def test_haplotype_with_one_genotype(data_dir):
    # test_haplotypes.cpp:12-44 — two overlapping records merge into one site
    # with genotype num 3 (the reference builds from raw sequence 'SGTACGEEF'
    # whose non-ACGT chars act as untraversable; we mirror with the graph API)
    from graphtyper_tpu.graph.graph import Graph
    from graphtyper_tpu.graph.coords import GenomicRegion
    from graphtyper_tpu.graph.records import Allele, VarRecord

    g = Graph()
    records = [
        VarRecord(pos=1, ref=Allele(b"GTACG"), alts=[Allele(b"G")]),
        VarRecord(pos=1, ref=Allele(b"G"), alts=[Allele(b"K")]),
    ]
    g.add_genomic_region(b"SGTACGEEF", records, GenomicRegion())
    g.create_special_positions()
    sites = g.genotypes()
    assert len(sites) == 1
    assert sites[0].num == 3


def test_absolute_and_contig_positions():
    # test_genomic_region.cpp:12-45 (commented out upstream; semantics hold)
    contigs = [Contig("chr1", 66), Contig("chr2", 66), Contig("chr3", 66), Contig("chr4", 66)]
    ap = AbsolutePosition(contigs)
    assert ap.get_absolute_position("chr1", 1) == 1
    assert ap.get_absolute_position("chr1", 100) == 100
    assert ap.get_absolute_position("chr2", 100) == 100 + 66
    assert ap.get_absolute_position("chr4", 1) == 1 + 3 * 66
    assert ap.get_contig_position(1) == ("chr1", 1)
    assert ap.get_contig_position(3) == ("chr1", 3)
    assert ap.get_contig_position(1 + 66) == ("chr2", 1)
    assert ap.get_contig_position(66) == ("chr1", 66)


def test_mismatches_of_first_and_last_base_goldens():
    """Upstream goldens (test/utilities/test_utilities.cpp "Mismatches of the
    last base" / "... first base"): the Hamming-1 mutation set at the flank
    positions contains exactly the three single-base substitutions."""
    import numpy as np

    from graphtyper_tpu.index.kmer_index import hamming1_keys
    from graphtyper_tpu.utils.dna import encode, pack_kmers, unpack_kmer

    def kmer_key(s):
        keys, _ = pack_kmers(encode(s), 32)
        return np.array([keys[0]], dtype=np.uint64)

    def muts_at(kmer_str, pos):
        """All Hamming-1 mutations of the kmer at string position pos."""
        all96 = hamming1_keys(kmer_key(kmer_str)).reshape(-1)
        out = set()
        for key in all96.tolist():
            s = unpack_kmer(int(key), 32)
            diffs = [i for i in range(32) if s[i] != kmer_str[i]]
            if diffs == [pos]:
                out.add(s)
        return out

    # last base 'A' -> C, G, T at position 31
    kmer = "ATTCCCCAGGTTTCCCCAGGTTTCCCCAGGTA"
    assert muts_at(kmer, 31) == {
        "ATTCCCCAGGTTTCCCCAGGTTTCCCCAGGTC",
        "ATTCCCCAGGTTTCCCCAGGTTTCCCCAGGTG",
        "ATTCCCCAGGTTTCCCCAGGTTTCCCCAGGTT",
    }
    # last base 'C'
    kmer = "TTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTC"
    assert muts_at(kmer, 31) == {
        "TTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTA",
        "TTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTG",
        "TTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTT",
    }
    # first base 'A' -> C, G, T at position 0
    kmer = "ATTCCCCAGGTTTCCCCAGGTTTCCCCAGGTA"
    assert muts_at(kmer, 0) == {
        "CTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTA",
        "GTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTA",
        "TTTCCCCAGGTTTCCCCAGGTTTCCCCAGGTA",
    }
    # every kmer yields exactly 96 mutations, all Hamming distance 1
    all96 = hamming1_keys(kmer_key(kmer)).reshape(-1)
    assert len(all96) == 96
    strs = [unpack_kmer(int(k), 32) for k in all96.tolist()]
    assert all(sum(a != b for a, b in zip(s, kmer)) == 1 for s in strs)
    assert len(set(strs)) == 96
