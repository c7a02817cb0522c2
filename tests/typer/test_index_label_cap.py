"""max_index_labels: multi-key lookups (Hamming-1 probe sets, IUPAC forks)
give up on a kmer once its labels exceed the budget (ph_index.cpp:49-57,
options.hpp max_index_labels=75) — single-exact-key lookups are never capped."""

import numpy as np

from graphtyper_tpu.constants import K, MAX_INDEX_LABELS
from graphtyper_tpu.index.kmer_index import KmerIndex, hamming1_keys
from graphtyper_tpu.typer.alignment import query_index, query_index_hamming1


def _index_of(keys_with_counts):
    kmers, starts, ends, var_ids = [], [], [], []
    for key, count in keys_with_counts:
        for j in range(count):
            kmers.append(key)
            starts.append(j + 1)
            ends.append(j + K)
            var_ids.append(-1)
    return KmerIndex.build(
        np.array(kmers, dtype=np.uint64),
        np.array(starts, dtype=np.int64),
        np.array(ends, dtype=np.int64),
        np.array(var_ids, dtype=np.int64),
    )


def _codes_of(key: int) -> np.ndarray:
    return np.array([(key >> (2 * (K - 1 - i))) & 3 for i in range(K)], dtype=np.uint8)


def test_hamming1_set_capped():
    base = int(np.random.default_rng(0).integers(0, 1 << 62))
    muts = hamming1_keys(np.array([base], dtype=np.uint64))[0]
    # one mutated key is hugely repetitive: total hamming-1 labels > budget
    idx_over = _index_of([(int(muts[0]), MAX_INDEX_LABELS + 5)])
    codes = _codes_of(base)
    h1 = query_index_hamming1(codes, idx_over)
    assert h1[0] == [], "over-budget hamming-1 set must drop entirely"
    # at the budget: kept
    idx_at = _index_of([(int(muts[0]), MAX_INDEX_LABELS)])
    h1 = query_index_hamming1(codes, idx_at)
    assert len(h1[0]) == MAX_INDEX_LABELS


def test_single_exact_key_never_capped():
    base = int(np.random.default_rng(1).integers(0, 1 << 62))
    idx = _index_of([(base, MAX_INDEX_LABELS + 50)])
    h0 = query_index(_codes_of(base), idx)
    assert len(h0[0]) == MAX_INDEX_LABELS + 50


def test_repeat_region_native_matches_python(tmp_path):
    """A tandem-repeat region pushes Hamming-1 label sets over the budget:
    the native caller and the Python loop must cap identically (byte-equal
    output)."""
    import gzip
    from dataclasses import replace

    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta

    rng = np.random.default_rng(8)
    unit = _random_seq(rng, 33)
    seq = np.concatenate(
        [_random_seq(rng, 3000)] + [unit] * 120 + [_random_seq(rng, 3000)]
    )
    fasta = str(tmp_path / "ref.fa")
    L = len(seq)
    _write_fasta(fasta, "chrR", seq)

    # het SNP in the middle of the repeat block: reads carrying it have
    # kmers at Hamming distance 1 from ~119 repeat copies, so their
    # Hamming-1 label sets blow past the budget (verified: they cap to [])
    hap = seq.copy()
    p_snp = 3000 + 60 * 33 + 16
    hap[p_snp] = ord("ACGT"[(b"ACGT".index(hap[p_snp : p_snp + 1].tobytes()) + 1) % 4])

    sam = str(tmp_path / "r.sam")
    read_len, frag = 125, 320
    recs = []
    for i in range(1200):
        src = seq if i % 2 == 0 else hap
        start = int(rng.integers(0, L - frag))
        r1 = src[start : start + read_len].tobytes().decode()
        p2 = start + frag - read_len
        r2 = src[p2 : p2 + read_len].tobytes().decode()
        q = "I" * read_len
        recs.append((start, f"r{i}\t99\tchrR\t{start + 1}\t60\t{read_len}M\t=\t{p2 + 1}\t{frag}\t{r1}\t{q}"))
        recs.append((p2, f"r{i}\t147\tchrR\t{p2 + 1}\t60\t{read_len}M\t=\t{start + 1}\t{-frag}\t{r2}\t{q}"))
    recs.sort(key=lambda t: t[0])
    with open(sam, "w") as f:
        f.write(f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrR\tLN:{L}\n@RG\tID:rg\tSM:s\n")
        for _, l in recs:
            f.write(l + "\n")

    def _body(p):
        return [l for l in gzip.open(p, "rt").read().splitlines() if not l.startswith("#")]

    old = current_options()
    try:
        out_nat = genotype(fasta, [sam], f"chrR:1-{L}", str(tmp_path / "out_nat"))
        set_options(replace(old, native_caller="off"))
        out_py = genotype(fasta, [sam], f"chrR:1-{L}", str(tmp_path / "out_py"))
    finally:
        set_options(old)
    assert _body(out_nat) == _body(out_py)
