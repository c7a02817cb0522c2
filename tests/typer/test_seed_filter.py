"""The native seed filter (gt_seed_filter_build) must never produce a false
negative: every index key passes the exact bitset, and every kmer within
Hamming-1 (in 2-bit space) of an index key passes the neighborhood bitset.
False positives are allowed (the aligner verifies candidates exactly), so
only the no-miss direction is load-bearing for bit-parity.
"""

import ctypes

import numpy as np
import pytest

from graphtyper_tpu.io.native import get_lib


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    from graphtyper_tpu.typer.native_align import _setup_lib

    _setup_lib(lib)
    lib.gt_seed_filter_test.restype = ctypes.c_int32
    lib.gt_seed_filter_test.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    return lib


def _build(lib, keys):
    keys = np.ascontiguousarray(np.asarray(keys, dtype=np.uint64))
    return lib.gt_seed_filter_build(
        keys.ctypes.data_as(ctypes.c_void_p), len(keys), 2
    )


def test_no_false_negatives(lib):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64) * 2 + 1
    handle = _build(lib, keys)
    try:
        for k in keys[:200].tolist():
            assert lib.gt_seed_filter_test(handle, k) & 1, "exact member missed"
        # every Hamming-1 neighbor of a key must set the ham bit when probed
        # from the neighbor's side (the aligner probes the READ kmer)
        for k in keys[:25].tolist():
            for kpos in range(32):
                cur = (k >> (2 * kpos)) & 3
                cleared = k & ~(3 << (2 * kpos))
                for d in (1, 2, 3):
                    neighbor = cleared | ((cur ^ d) << (2 * kpos))
                    assert lib.gt_seed_filter_test(handle, neighbor) & 2, (
                        "Hamming-1 neighbor missed"
                    )
    finally:
        lib.gt_seed_filter_free(handle)


def test_far_keys_mostly_filtered(lib):
    """Statistical sanity: random 64-bit kmers (almost surely >1 mismatch
    from every key) should rarely pass either bitset — the filter actually
    filters (load factors keep FP in the low percent range)."""
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
    handle = _build(lib, keys)
    try:
        probes = rng.integers(0, 2**64, size=4000, dtype=np.uint64)
        hits_e = hits_h = 0
        for p in probes.tolist():
            r = lib.gt_seed_filter_test(handle, p)
            hits_e += r & 1
            hits_h += (r >> 1) & 1
        assert hits_e / len(probes) < 0.05
        assert hits_h / len(probes) < 0.20
    finally:
        lib.gt_seed_filter_free(handle)


def test_incremental_add_covers_new_keys(lib):
    """gt_seed_filter_add: build(subset) + add(rest) must pass every key and
    Hamming-1 neighbor that build(all) passes (superset-correctness — the
    adopt path can only prune less, never miss)."""
    rng = np.random.default_rng(23)
    all_keys = np.unique(rng.integers(0, 2**64, size=12000, dtype=np.uint64))
    subset, rest = all_keys[:10000], np.ascontiguousarray(all_keys[10000:])
    h = _build(lib, subset)
    try:
        lib.gt_seed_filter_add(h, rest.ctypes.data_as(ctypes.c_void_p), len(rest))
        for k in all_keys[rng.integers(0, len(all_keys), 500)].tolist():
            r = lib.gt_seed_filter_test(h, k)
            assert r & 1, "exact bit missing after add"
            # a random Hamming-1 neighbor must pass the neighborhood bitset
            pos = int(rng.integers(0, 32))
            d = int(rng.integers(1, 4))
            nb = k ^ (d << (2 * pos))
            assert lib.gt_seed_filter_test(h, nb) & 2, "ham bit missing after add"
    finally:
        lib.gt_seed_filter_free(h)
