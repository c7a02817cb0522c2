"""Device seeding parity: the batched probe kernel (ops/seed_probe.py) must
reproduce the host's exact + Hamming-1 index probing bit-for-bit.

Reference semantics: src/typer/alignment.cpp:30-31 (exact + Hamming-1
seeding), src/utilities/kmer_help_functions.cpp:93-119 (96-key expansion).
"""

import numpy as np
import pytest

from graphtyper_tpu.ops.seed_probe import (
    DeviceSeeder,
    PROBES_PER_KMER,
    _ham_masks,
    bitset_bits_for,
    build_bitset,
)

K = 32


def _host_probe_ids(codes_mat, lens, keys_sorted):
    """Oracle: the candidate set the kernel must produce is exactly the
    probes whose hash bit is set — no false negatives vs true membership."""
    keyset = set(keys_sorted.tolist())
    n_rows, L = codes_mat.shape
    nk = 1 + (L - K) // (K - 1)
    true_hits = []
    for row in range(n_rows):
        for i in range(nk):
            p = (K - 1) * i
            if p + K > lens[row]:
                continue
            win = codes_mat[row, p : p + K]
            if (win >= 4).any():
                continue
            key = 0
            for c in win.tolist():
                key = (key << 2) | c
            for j in range(PROBES_PER_KMER):
                if j == 0:
                    k2 = key
                else:
                    kpos = (j - 1) // 3
                    d = (j - 1) % 3 + 1
                    k2 = key ^ (d << (2 * kpos))
                if k2 in keyset:
                    true_hits.append(row * nk * PROBES_PER_KMER + i * PROBES_PER_KMER + j)
    return true_hits


def test_ham_mask_order_matches_host():
    hi, lo = _ham_masks()
    # j = 1 + kpos*3 + (d-1): flip 2-bit position kpos by xor d
    assert lo[1] == 1 and lo[2] == 2 and lo[3] == 3  # kpos 0
    assert lo[4] == 1 << 2  # kpos 1, d 1
    assert hi[1 + 16 * 3] == 1  # kpos 16 lives in the high half
    assert hi[0] == 0 and lo[0] == 0


def test_device_candidates_superset_and_exactness():
    rng = np.random.default_rng(3)
    # synthetic index keys + reads that contain some of them (with Ham-1
    # mutations so the 96-key expansion has true hits)
    n_rows, L = 64, 151
    codes = rng.integers(0, 4, size=(n_rows, L)).astype(np.uint8)
    lens = np.full(n_rows, L, np.int32)
    lens[5] = 70  # short read: trailing kmers invalid
    codes[7, 3] = 4  # ambiguous base: kmer 0 masked out on device
    keys = []
    for row in range(0, n_rows, 3):
        win = codes[row, 31 : 31 + K]
        if (win >= 4).any():
            continue
        key = 0
        for c in win.tolist():
            key = (key << 2) | c
        keys.append(key)
        keys.append(key ^ (2 << (2 * 7)))  # a Ham-1 neighbor
    keys = np.unique(np.array(keys, dtype=np.uint64))

    seeder = DeviceSeeder(keys)
    ids = seeder.probe(codes, lens)
    assert ids is not None
    got = set(ids.tolist())
    want = _host_probe_ids(codes, lens, keys)
    # every true membership hit must be a candidate (no false negatives)
    missing = [w for w in want if w not in got]
    assert not missing, f"kernel lost true probes: {missing[:5]}"
    assert len(want) > 0
    # candidates are sorted and within range
    assert np.all(np.diff(ids) > 0)
    nk = 1 + (L - K) // (K - 1)
    # the padded row bucket may extend the row space; real rows bound checked
    real = ids[ids < n_rows * nk * PROBES_PER_KMER]
    assert len(real) >= len(want)


def test_bitset_builders_agree():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    bits = bitset_bits_for(len(keys))
    np_words = build_bitset(keys, bits)
    # the C++ builder (used in production) must produce the identical bitset
    from graphtyper_tpu.io.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    seeder = DeviceSeeder(np.sort(keys), bits=bits)
    import numpy as _np

    got = _np.asarray(seeder.bitset)
    assert got.shape == np_words.shape
    assert (got == np_words).all()


def test_genotype_device_seed_parity(tmp_path):
    """End-to-end: device_seed on vs off produce byte-identical VCFs."""
    import gzip
    import os
    from dataclasses import replace

    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=30_000, coverage=25.0, seed=13, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    outs = {}
    base = current_options()
    try:
        for mode in ("off", "on"):
            set_options(replace(base, device_seed=mode))
            out = genotype(
                sim.fasta, sim.sams, f"{cfg.chrom}:1-30000", str(tmp_path / f"o_{mode}")
            )
            outs[mode] = gzip.open(out, "rb").read()
    finally:
        set_options(base)
    assert outs["on"] == outs["off"]
