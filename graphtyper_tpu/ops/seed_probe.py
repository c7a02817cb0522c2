"""Device seeding: batched k-mer probe expansion + membership filtering.

The production aligner's dominant cost is its seed stage: each read takes nk
non-overlapping 32-mers (stride K-1) and probes the k-mer index with the
exact key plus 96 Hamming-1 variants — ~400 index probes per read
(reference: src/typer/alignment.cpp:30-31 exact+Hamming-1 seeding;
src/utilities/kmer_help_functions.cpp:93-119 the 96-key expansion). On the
host that is a pointer-chasing hash/binary-search loop; here the whole
pool's probe set is generated and filtered on the TPU in one fused pass:

  1. build the 2-bit packed keys as (hi, lo) uint32 halves with shift/adds,
  2. expand the 97 probe variants per kmer via a static XOR-mask table
     (Hamming-1 in 2-bit space is `key ^ (d << 2*kpos)`),
  3. hash each probe and test it against a 2^bits membership bitset of the
     index keys (one gather per probe),
  4. compact the surviving candidate probe ids (jnp.nonzero).

The host then verifies only the ~1-3% candidates exactly against the sorted
key table (native/gt_align.cpp SeedCands). The result is bit-identical to
probing all 97 keys per kmer: the bitset is built over every index key with
the same hash (gt_build_seed_bitset), so it has NO false negatives, and
false positives are eliminated by the host's exact lookup.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

K = 32
PROBES_PER_KMER = 97  # 1 exact + 32 positions x 3 deltas
HASH_C1 = 0x9E3779B1  # must match native/gt_align.cpp seed_hash
HASH_C2 = 0x85EBCA77


@lru_cache(maxsize=1)
def _ham_masks() -> tuple[np.ndarray, np.ndarray]:
    """XOR masks per probe j (hi, lo uint32 halves); j=0 exact,
    j = 1 + kpos*3 + (d-1) flips 2-bit position kpos (shift ascending) by d
    — the same probe order the host seeding loop uses."""
    hi = np.zeros(PROBES_PER_KMER, np.uint32)
    lo = np.zeros(PROBES_PER_KMER, np.uint32)
    j = 1
    for kpos in range(K):
        for d in (1, 2, 3):
            m = d << (2 * kpos)
            hi[j] = (m >> 32) & 0xFFFFFFFF
            lo[j] = m & 0xFFFFFFFF
            j += 1
    return hi, lo


def bitset_bits_for(n_keys: int) -> int:
    """Bitset sized so the false-positive rate stays ~1-2%."""
    bits = 24
    while (1 << bits) < 64 * max(1, n_keys) and bits < 28:
        bits += 1
    return bits


def build_bitset(keys_u64: np.ndarray, bits: int) -> np.ndarray:
    """Host-side bitset build (numpy twin of gt_build_seed_bitset)."""
    lo = (keys_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (keys_u64 >> np.uint64(32)).astype(np.uint32)
    h = (lo * np.uint32(HASH_C1) + hi * np.uint32(HASH_C2)) >> np.uint32(32 - bits)
    words = np.zeros(1 << (bits - 5), np.uint32)
    np.bitwise_or.at(words, h >> np.uint32(5), np.uint32(1) << (h & np.uint32(31)))
    return words


@lru_cache(maxsize=1)
def _jitted_probe():
    import jax

    return partial(jax.jit, static_argnames=("nk", "bits", "cap"))(_probe_impl)


def _probe_impl(codes, lens, bitset, nk: int, bits: int, cap: int):
    """codes [S, L] uint8 (pad 15), lens [S] int32, bitset uint32 words.

    Returns (ids [cap] int32 ascending, -1 padded; count int32). Probe id
    = row*(nk*97) + kpos*97 + j, matching native/gt_align.cpp SeedCands.
    """
    import jax
    import jax.numpy as jnp

    S, L = codes.shape
    mask_hi, mask_lo = _ham_masks()
    mask_hi = jnp.asarray(mask_hi)
    mask_lo = jnp.asarray(mask_lo)

    pos = np.arange(nk, dtype=np.int32) * (K - 1)
    win_idx = pos[:, None] + np.arange(K, dtype=np.int32)[None, :]  # [nk, K]
    win = codes[:, win_idx].astype(jnp.uint32)  # [S, nk, K]

    kmer_valid = (jnp.asarray(pos)[None, :] + K <= lens[:, None]) & jnp.all(
        win < 4, axis=-1
    )  # [S, nk]

    w_hi = (np.uint32(4) ** np.arange(15, -1, -1, dtype=np.int64)).astype(np.uint32)
    w_lo = w_hi
    hi = jnp.sum(win[:, :, :16] * jnp.asarray(w_hi)[None, None, :], axis=-1)
    lo = jnp.sum(win[:, :, 16:] * jnp.asarray(w_lo)[None, None, :], axis=-1)

    p_hi = hi[:, :, None] ^ mask_hi[None, None, :]  # [S, nk, 97]
    p_lo = lo[:, :, None] ^ mask_lo[None, None, :]
    h = p_lo * jnp.uint32(HASH_C1) + p_hi * jnp.uint32(HASH_C2)
    idx = h >> jnp.uint32(32 - bits)
    word = bitset[(idx >> jnp.uint32(5)).astype(jnp.int32)]
    bit = (word >> (idx & jnp.uint32(31))) & jnp.uint32(1)

    cand = (bit == 1) & kmer_valid[:, :, None]
    flat = cand.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    (ids,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    return ids.astype(jnp.int32), count


class DeviceSeeder:
    """Per-index device seeding state: the membership bitset lives on the
    device for the lifetime of one call iteration's index."""

    def __init__(self, keys_u64: np.ndarray, bits: int | None = None):
        import ctypes

        import jax

        from graphtyper_tpu.io.native import get_lib

        self.bits = bits if bits is not None else bitset_bits_for(len(keys_u64))
        lib = get_lib()
        if lib is not None and len(keys_u64):
            if not getattr(lib, "_bitset_ready", False):
                lib.gt_build_seed_bitset.restype = None
                lib.gt_build_seed_bitset.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_int64,
                    ctypes.c_void_p,
                    ctypes.c_int32,
                ]
                lib._bitset_ready = True
            keys = np.ascontiguousarray(keys_u64.astype(np.uint64))
            words = np.zeros(1 << (self.bits - 5), np.uint32)
            lib.gt_build_seed_bitset(
                keys.ctypes.data_as(ctypes.c_void_p),
                len(keys),
                words.ctypes.data_as(ctypes.c_void_p),
                self.bits,
            )
        else:
            words = build_bitset(keys_u64.astype(np.uint64), self.bits)
        self.bitset = jax.device_put(words)
        self.overflows = 0

    def probe(self, codes: np.ndarray, lens: np.ndarray) -> np.ndarray | None:
        """codes [n_rows, L] uint8, lens [n_rows]; returns sorted int64
        global probe ids, or None if the candidate cap overflowed (caller
        falls back to host probing — correctness is unaffected)."""
        import jax.numpy as jnp

        n_rows, L = codes.shape
        if n_rows == 0 or L < K:
            return np.zeros(0, np.int64)
        nk = 1 + (L - K) // (K - 1)
        S = 1 << max(10, (n_rows - 1).bit_length())
        if S > n_rows:
            codes = np.pad(codes, ((0, S - n_rows), (0, 0)), constant_values=15)
            lens = np.pad(lens, (0, S - n_rows))
        cap = max(4096, S * nk * PROBES_PER_KMER // 16)
        ids, count = _jitted_probe()(
            jnp.asarray(codes), jnp.asarray(lens.astype(np.int32)), self.bitset,
            nk=nk, bits=self.bits, cap=cap,
        )
        count = int(count)
        if count > cap:
            self.overflows += 1
            return None
        out = np.asarray(ids[:count]).astype(np.int64)
        return out
