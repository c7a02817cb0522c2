"""Pallas TPU kernel: batched semi-global affine Smith-Waterman.

Same model as ops/sw.py (match 1, mismatch -4, gap open 7, extend 1, flat
query-end clips 5, free database columns) — the paw-AVX512 replacement for
indel realignment (reference: caller.cpp:2007), batched over (read, window)
pairs.

Layout: grid = (batch_tiles, query_row_blocks); each grid step advances the
DP by `rows_per_step` query rows for a (block_b, N) tile of independent
alignments, with the row loop unrolled inside the kernel so the DP state
(H, F, start, and the end-clip candidates) stays in vector registers
between rows and the VMEM scratch is read/written once per step instead of
once per row. Each row is fully
vectorized over database lanes; the within-row affine-gap dependency is a
prefix max computed with a log2(N) shift-doubling scan carrying
(value, start-index) pairs so the database begin position of the best
alignment survives to the output.
"""

from __future__ import annotations

import functools

from graphtyper_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphtyper_tpu.constants import (
    SCORE_CLIP,
    SCORE_GAP_EXTEND,
    SCORE_GAP_OPEN,
    SCORE_MATCH,
    SCORE_MISMATCH,
)

NEG = -(10**6)  # plain python int: jnp scalars would be captured consts


def _shift_right(x: jnp.ndarray, k: int, fill, lane_iota: jnp.ndarray) -> jnp.ndarray:
    rolled = jnp.roll(x, k, axis=-1)
    return jnp.where(lane_iota < k, fill, rolled)


def _prefix_max_with_arg(v, a, lane_iota):
    """Running (max, argpayload) along lanes via shift-doubling."""
    n = v.shape[-1]
    k = 1
    while k < n:
        v_shift = _shift_right(v, k, NEG, lane_iota)
        a_shift = _shift_right(a, k, 0, lane_iota)
        take = v_shift > v
        v = jnp.where(take, v_shift, v)
        a = jnp.where(take, a_shift, a)
        k *= 2
    return v, a


def _sw_kernel(
    q_ref,  # [Bt, Mp] full queries (lane dims < 128 are not lowerable)
    qlen_ref,  # [Bt, 1]
    d_ref,  # [Bt, N]
    dlen_ref,  # [Bt, 1]
    score_ref,  # [Bt, 1] out
    begin_ref,  # [Bt, 1] out
    end_ref,  # [Bt, 1] out
    H_s,  # scratch [Bt, N]
    F_s,
    S_s,
    bm_s,
    sm_s,
    rm_s,  # row where each lane's best clip-end candidate was set
    *,
    Mp: int,
    N: int,
    R: int,
    match: int,
    mismatch: int,
    go: int,
    ge: int,
    clip: int,
):
    Bt = d_ref.shape[0]
    step = pl.program_id(1)
    d = d_ref[:]
    qlen = qlen_ref[:]
    dlen = dlen_ref[:]
    jpos = jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    jprefix = jpos + 1
    d_valid = jpos < dlen

    @pl.when(step == 0)
    def _init():
        H_s[:] = jnp.zeros((Bt, N), jnp.int32)
        F_s[:] = jnp.full((Bt, N), NEG, jnp.int32)
        S_s[:] = jprefix
        bm_s[:] = jnp.full((Bt, N), NEG, jnp.int32)
        sm_s[:] = jnp.zeros((Bt, N), jnp.int32)
        rm_s[:] = jnp.zeros((Bt, N), jnp.int32)

    H = H_s[:]
    F = F_s[:]
    S = S_s[:]
    bm = bm_s[:]
    sm = sm_s[:]
    rm = rm_s[:]

    q_all = q_ref[:]  # [Bt, Mp]
    q_iota = jax.lax.broadcasted_iota(jnp.int32, q_all.shape, 1)

    for r in range(R):  # unrolled: the DP state stays in registers across rows
        i = step * R + (r + 1)  # DP row (1-based), traced scalar
        row_active = i <= qlen  # [Bt, 1] broadcasts over lanes

        # masked lane reduction (reduce-then-broadcast, which Mosaic supports)
        qb = jnp.sum(jnp.where(q_iota == (i - 1), q_all, 0), axis=1, keepdims=True)  # [Bt, 1]
        s = jnp.where(qb == d, jnp.int32(match), jnp.int32(-mismatch))
        s = jnp.where((qb >= 4) | (d >= 4), jnp.int32(0), s)
        s = jnp.where(d_valid, s, NEG)

        is_first = i == 1
        H_shift = _shift_right(H, 1, jnp.where(is_first, 0, NEG), jpos)
        S_shift = _shift_right(S, 1, 0, jpos)
        fresh_val = jnp.where(is_first, jnp.int32(0), jnp.int32(-clip))
        use_fresh = fresh_val > H_shift
        diag_val = jnp.where(use_fresh, fresh_val, H_shift)
        diag_start = jnp.where(use_fresh, jpos, S_shift)
        M_cand = diag_val + s

        F_new = jnp.maximum(H - go, F - ge)
        use_M = M_cand >= F_new
        H_tmp = jnp.where(use_M, M_cand, F_new)
        S_tmp = jnp.where(use_M, diag_start, S)

        T = H_tmp + jprefix * ge
        runmax, runstart = _prefix_max_with_arg(T, S_tmp, jpos)
        runmax_sh = _shift_right(runmax, 1, NEG, jpos)
        runstart_sh = _shift_right(runstart, 1, 0, jpos)
        E_val = runmax_sh - go - (jprefix - 1) * ge
        use_E = E_val > H_tmp
        H_row = jnp.where(use_E, E_val, H_tmp)
        S_row = jnp.where(use_E, runstart_sh, S_tmp)

        H = jnp.where(row_active, H_row, H)
        S = jnp.where(row_active, S_row, S)
        F = jnp.where(row_active, F_new, F)

        # per-lane end-clip candidates for rows i < qlen
        mid_active = row_active & (i < qlen) & d_valid
        cand = H - clip
        improve = mid_active & (cand > bm)
        bm = jnp.where(improve, cand, bm)
        sm = jnp.where(improve, S, sm)
        rm = jnp.where(improve, i, rm)

    H_s[:] = H
    F_s[:] = F
    S_s[:] = S
    bm_s[:] = bm
    sm_s[:] = sm
    rm_s[:] = rm

    @pl.when(step == (Mp // R) - 1)
    def _finalize():
        # tie-breaks mirror the host DP exactly (ops/sw.py): the full-query
        # category wins over clip-end on equal score GLOBALLY (not per lane),
        # then the earliest (row, j) clip candidate / smallest-j final cell
        # is chosen via a lexicographic key so the lane-reduction order on
        # hardware cannot change the answer
        H_fin = jnp.where(d_valid, H, NEG)
        best_fin = jnp.max(H_fin, axis=1, keepdims=True)
        best_clip = jnp.max(bm, axis=1, keepdims=True)
        use_clip = best_clip > best_fin  # [Bt, 1], strict: ties keep full query
        val_N = jnp.where(use_clip, bm, H_fin)
        start_N = jnp.where(use_clip, sm, S)
        best = jnp.where(use_clip, best_clip, best_fin)
        is_best = val_N == best
        key = jnp.where(use_clip, rm * (N + 2) + jprefix, jprefix)
        sel_key = jnp.min(jnp.where(is_best, key, (Mp + 2) * (N + 2)), axis=1, keepdims=True)
        chosen = is_best & (key == sel_key)
        fin_j = jnp.max(jnp.where(chosen, jprefix, 0), axis=1, keepdims=True)
        fin_s = jnp.max(jnp.where(chosen, start_N, 0), axis=1, keepdims=True)
        score_ref[:] = jnp.where(qlen > 0, best, 0)
        begin_ref[:] = fin_s
        end_ref[:] = fin_j


def auto_block_b(N: int) -> int:
    """Largest power-of-two batch tile whose compiled VMEM footprint fits.

    The unrolled row loop keeps ~34 live int32 [block_b, N] vectors on the
    Mosaic stack (measured: 17.75MB at 256x512); v5e scoped VMEM is 16MB.
    256 is the best-measured tile at the common N<=256 window sizes
    (32.6 Gcell/s with R=8); larger databases halve the tile instead of
    OOMing the compile."""
    budget = 14 * 1024 * 1024  # leave headroom under the 16MB scoped limit
    per_cell = 136  # bytes per (batch, lane) cell, measured from the OOM report
    b = 256
    while b > 8 and b * max(N, 64) * per_cell > budget:
        b //= 2
    return b


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap_open", "gap_extend", "clip",
        "block_b", "rows_per_step", "interpret",
    ),
)
def sw_align_pallas(
    queries: jnp.ndarray,  # [B, M]
    q_lens: jnp.ndarray,  # [B]
    databases: jnp.ndarray,  # [B, N]
    d_lens: jnp.ndarray,  # [B]
    match: int = SCORE_MATCH,
    mismatch: int = SCORE_MISMATCH,
    gap_open: int = SCORE_GAP_OPEN,
    gap_extend: int = SCORE_GAP_EXTEND,
    clip: int = SCORE_CLIP,
    block_b: int | None = None,
    rows_per_step: int = 8,
    interpret: bool = False,
):
    B, M = queries.shape
    _, N = databases.shape
    if block_b is None:
        block_b = auto_block_b(N)
    R = rows_per_step
    # pad the batch to the next power of two >= block_b: the grid shape is
    # baked into the executable, so geometric bucketing bounds the number of
    # distinct compiles at log2(B_max) instead of B_max/block_b
    Bt = block_b
    while Bt < B:
        Bt *= 2
    pad_b = Bt - B
    pad_m = (-M) % R
    if pad_b:
        q_lens = jnp.pad(q_lens, (0, pad_b))
        d_lens = jnp.pad(d_lens, (0, pad_b))
        databases = jnp.pad(databases, ((0, pad_b), (0, 0)), constant_values=5)
    if pad_b or pad_m:
        # pad rows carry base 5 (mismatch-everything); rows beyond qlen are
        # inert anyway via the row_active mask
        queries = jnp.pad(queries, ((0, pad_b), (0, pad_m)), constant_values=5)
    Bp, Mp = B + pad_b, M + pad_m
    grid = (Bp // block_b, Mp // R)
    kernel = functools.partial(
        _sw_kernel,
        Mp=Mp, N=N, R=R,
        match=match, mismatch=mismatch, go=gap_open, ge=gap_extend, clip=clip,
    )
    out_shape = [jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 3
    score, begin, end = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, Mp), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, N), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((block_b, 1), lambda i, j: (i, 0))] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_b, N), jnp.int32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        queries.astype(jnp.int32),
        q_lens.astype(jnp.int32).reshape(-1, 1),
        databases.astype(jnp.int32),
        d_lens.astype(jnp.int32).reshape(-1, 1),
    )
    return score[:B, 0], begin[:B, 0], end[:B, 0]
