"""Rotated Pallas SW kernel parity: exact (score, begin, end) agreement with
the host DP (ops/sw.py) in interpret mode on CPU, over randomized, planted,
and adversarial batches. The kernel is the production device realignment
path (reference analog: paw SW at src/typer/caller.cpp:2007)."""

import numpy as np
import pytest

from graphtyper_tpu.ops.sw import align_batch
from graphtyper_tpu.ops.sw_rot import sw_align_rot


def _check(Q, qlens, D, dlens, **kw):
    host = align_batch(Q, qlens, D, dlens, device=False)
    s, bg, en = sw_align_rot(
        np.asarray(Q), np.asarray(qlens), np.asarray(D), np.asarray(dlens),
        interpret=True, **kw,
    )
    np.testing.assert_array_equal(host.score, np.asarray(s))
    np.testing.assert_array_equal(host.database_begin, np.asarray(bg))
    np.testing.assert_array_equal(host.database_end, np.asarray(en))


@pytest.mark.parametrize("seed", range(3))
def test_randomized_parity(seed):
    rng = np.random.default_rng(seed)
    B, Mx, Nx = 64, 24, 64
    qlens = rng.integers(6, Mx + 1, size=B).astype(np.int32)
    dlens = rng.integers(24, Nx + 1, size=B).astype(np.int32)
    Q = np.full((B, Mx), 5, dtype=np.uint8)
    D = np.full((B, Nx), 5, dtype=np.uint8)
    for b in range(B):
        Q[b, : qlens[b]] = rng.integers(0, 4, qlens[b])
        D[b, : dlens[b]] = rng.integers(0, 4, dlens[b])
    # planted noisy hits so score ties and clip races actually occur
    for b in range(0, B, 2):
        m = qlens[b]
        if dlens[b] >= m:
            st = rng.integers(0, dlens[b] - m + 1)
            Q[b, :m] = D[b, st : st + m]
            Q[b, rng.integers(0, m)] = rng.integers(0, 4)
    _check(Q, qlens, D, dlens)


def test_adversarial_ties_and_gaps():
    """Low-entropy repeats maximize tie pressure on the begin/end rules;
    long homopolymers force the affine E/F recurrences through both the
    open and extend arms."""
    rng = np.random.default_rng(99)
    B, Mx, Nx = 32, 20, 48
    qlens = np.full(B, Mx, np.int32)
    dlens = np.full(B, Nx, np.int32)
    Q = rng.integers(0, 2, (B, Mx)).astype(np.uint8)  # AC-only alphabet
    D = rng.integers(0, 2, (B, Nx)).astype(np.uint8)
    Q[0] = 0  # poly-A query vs poly-A database: every start ties
    D[0] = 0
    Q[1, :10] = D[1, 5:15]  # exact prefix hit, garbage tail -> end clip
    Q[1, 10:] = 3
    Q[2] = D[2, :Mx][::-1]  # reversed: mostly mismatches
    # deletion shape: query skips 6 database bases mid-match
    D[3, :24] = rng.integers(0, 4, 24)
    Q[3, :10] = D[3, :10]
    Q[3, 10:20] = D[3, 16:26]
    _check(Q, qlens, D, dlens)


def test_length_edges_and_iupac():
    """qlen shorter than every other row, N codes (>=4) scoring 0, and a
    dlen shorter than the query (forced clip/gap)."""
    Mx, Nx = 16, 32
    rng = np.random.default_rng(7)
    Q = rng.integers(0, 4, (8, Mx)).astype(np.uint8)
    D = rng.integers(0, 4, (8, Nx)).astype(np.uint8)
    qlens = np.array([16, 1, 6, 16, 16, 3, 16, 16], np.int32)
    dlens = np.array([32, 32, 32, 8, 32, 3, 32, 32], np.int32)
    Q[4, 2:9] = 4  # N run inside the query
    D[6, ::3] = 4  # Ns scattered through the database
    Q[7] = D[7, 10 : 10 + Mx]  # perfect full-length hit
    _check(Q, qlens, D, dlens)


def test_nondefault_blocking_params():
    """Parity must hold for every (r_block, col_unroll) blocking, since the
    bench sweeps them."""
    rng = np.random.default_rng(21)
    B, Mx, Nx = 16, 24, 40
    qlens = rng.integers(8, Mx + 1, size=B).astype(np.int32)
    dlens = rng.integers(20, Nx + 1, size=B).astype(np.int32)
    Q = np.full((B, Mx), 5, dtype=np.uint8)
    D = np.full((B, Nx), 5, dtype=np.uint8)
    for b in range(B):
        Q[b, : qlens[b]] = rng.integers(0, 4, qlens[b])
        D[b, : dlens[b]] = rng.integers(0, 4, dlens[b])
    _check(Q, qlens, D, dlens, r_block=4, col_unroll=1)
    _check(Q, qlens, D, dlens, r_block=16, col_unroll=4)


def test_align_batch_routes_to_rot_kernel(monkeypatch):
    """ops/sw.py's device path dispatches the rotated kernel."""
    from graphtyper_tpu.ops import sw as sw_mod

    called = {}

    def fake(q, ql, d, dl, *a, **kw):
        called["yes"] = True
        import graphtyper_tpu.ops.sw_rot as rot

        return rot.sw_align_rot(q, ql, d, dl, *a, interpret=True, **kw)

    monkeypatch.setattr(sw_mod, "_tpu_available", lambda: True)
    monkeypatch.setattr("graphtyper_tpu.ops.sw_rot.sw_align_rot", fake)
    rng = np.random.default_rng(5)
    Q = rng.integers(0, 4, (4, 12)).astype(np.uint8)
    D = rng.integers(0, 4, (4, 24)).astype(np.uint8)
    ql = np.full(4, 12, np.int32)
    dl = np.full(4, 24, np.int32)
    host = align_batch(Q, ql, D, dl, device=False)
    res = align_batch(Q, ql, D, dl, device=True)
    assert called.get("yes")
    np.testing.assert_array_equal(res.score, host.score)
