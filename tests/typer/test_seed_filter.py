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


def _bucket_find_decl(lib):
    lib.gt_seed_filter_bucket_find.restype = ctypes.c_int64
    lib.gt_seed_filter_bucket_find.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
    ]


def test_bucket_find_matches_searchsorted(lib):
    """The prefix-bucket accelerator must resolve every key lookup exactly as
    a full binary search over the sorted key array would (gt_align.cpp iget)."""
    _bucket_find_decl(lib)
    rng = np.random.default_rng(31)
    # adversarial mix: dense low-prefix cluster, dup-prone values, sparse tail
    keys = np.unique(np.concatenate([
        rng.integers(0, 2**20, size=3000, dtype=np.uint64),  # one bucket
        rng.integers(0, 2**64, size=9000, dtype=np.uint64),
        np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64),
    ]))
    keys = np.ascontiguousarray(keys)
    h = _build(lib, keys)
    try:
        kp = keys.ctypes.data_as(ctypes.c_void_p)
        # every member found at its exact index
        for i in rng.integers(0, len(keys), 400).tolist() + [0, len(keys) - 1]:
            assert lib.gt_seed_filter_bucket_find(h, kp, len(keys), int(keys[i])) == i
        # non-members miss (including Hamming-1 neighbors and bucket edges)
        probes = rng.integers(0, 2**64, size=400, dtype=np.uint64)
        member = np.isin(probes, keys)
        for p, m in zip(probes.tolist(), member.tolist()):
            got = lib.gt_seed_filter_bucket_find(h, kp, len(keys), p)
            if m:
                assert keys[got] == p
            else:
                assert got == -1
    finally:
        lib.gt_seed_filter_free(h)


def test_bucket_invalidated_on_add_and_reattachable(lib):
    """Donor adoption invariant: gt_seed_filter_add drops the bucket table
    (it describes the donor's key array, not the adopter's), and
    gt_seed_filter_bucket re-attaches it against the new array. Regression
    for the round-4 bug where an adopted filter kept the donor's buckets and
    silently broke seeding (zero discovered variants)."""
    _bucket_find_decl(lib)
    rng = np.random.default_rng(37)
    donor_keys = np.unique(rng.integers(0, 2**64, size=8000, dtype=np.uint64))
    index_keys = np.unique(np.concatenate([
        donor_keys[rng.random(len(donor_keys)) < 0.9],
        rng.integers(0, 2**64, size=1500, dtype=np.uint64),
    ]))
    index_keys = np.ascontiguousarray(index_keys)
    h = _build(lib, donor_keys)
    try:
        new = np.ascontiguousarray(np.setdiff1d(index_keys, donor_keys))
        lib.gt_seed_filter_add(h, new.ctypes.data_as(ctypes.c_void_p), len(new))
        kp = index_keys.ctypes.data_as(ctypes.c_void_p)
        # after add: no bucket table (must report "fall back", never wrong)
        assert lib.gt_seed_filter_bucket_find(h, kp, len(index_keys), int(index_keys[0])) == -2
        # after re-attach: exact on the NEW array
        lib.gt_seed_filter_bucket(h, kp, len(index_keys))
        for i in rng.integers(0, len(index_keys), 300).tolist():
            assert (
                lib.gt_seed_filter_bucket_find(h, kp, len(index_keys), int(index_keys[i])) == i
            )
    finally:
        lib.gt_seed_filter_free(h)
