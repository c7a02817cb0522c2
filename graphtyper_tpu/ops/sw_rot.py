"""Rotated Pallas SW kernel: batch across (sublane, lane), database sequential.

The row-major kernel (ops/sw_pallas.py) pays a log2(N)-step lane prefix-max
scan per DP row — measured ALU-issue-bound at ~22 Gcell/s with the scan
taking ~2/3 of all vector ops. This kernel removes every scan: 1024
independent alignments fill one (8, 128) vector register, the DP runs in
raster order (query rows in register blocks of R_BLOCK, database columns
sequential), and the affine-gap recurrences E (horizontal) and F (vertical)
become register carries — pure elementwise VPU work, ~6x fewer vector ops
per cell.

Exactness contract: identical (score, database_begin, database_end) to
ops/sw.py for every input (tests/ops/test_sw_rot.py pins randomized and
adversarial batches). Tie mapping from the host's vectorized form:
  * E prefix-max with latest-k argmax ties == the sequential recurrence
    E(j) = max(E(j-1) - ge, H_tmp(j-1) - go) preferring the fresh term on
    ties (take_fresh uses >=), with start = S_tmp(j-1).
  * F candidate's start is the row above's FINAL start at the same column
    (host: F_start = start[:, 1:]).
  * clip-end candidates: strictly-better across rows (earliest row wins
    ties), smallest column within a row — reproduced by a lexicographic
    (value, row, column) running update in (column, row) iteration order.
  * final row: argmax picks the smallest column among maxima (strict-> in
    ascending column order); full-query beats end-clip on equal score.

Reference bar this replaces: paw AVX512 pairwise SW (CMakeLists.txt:146,
used at caller.cpp:2007 for indel realignment).
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

NEG = -(10**6)
BIG = 0x3FFFFFFF
BT = 1024  # alignments per tile: one full (8, 128) vector register
# defaults from the hardware sweep (tools/bench_sw.py, v5e over the axon
# tunnel): r_block=4, col_unroll=16 medians ~113 Gcell/s on the 4096x152x256
# realignment workload vs ~106 for 8/8 and ~93 for 8/2
R_BLOCK = 4  # query rows per register block (default; static arg below)
COL_UNROLL = 16  # database columns unrolled per fori_loop step


def _sw_rot_kernel(
    q_ref,  # [Mp, 8, 128] int32 query codes (row-major over query positions)
    qlen_ref,  # [1, 8, 128]
    d_ref,  # [N, 8, 128] int32 database codes
    dlen_ref,  # [1, 8, 128]
    score_ref,  # [1, 8, 128] out
    begin_ref,
    end_ref,
    Hrow,  # scratch [N, 8, 128]: boundary row's final H per column
    Srow,  # boundary row's final start per column
    Frow,  # boundary row's F state per column
    *,
    Mp: int,
    N: int,
    match: int,
    mismatch: int,
    go: int,
    ge: int,
    clip: int,
    rb: int,
    cu: int,
):
    qlen = qlen_ref[0]
    dlen = dlen_ref[0]
    shape = qlen.shape  # (8, 128)

    zero = jnp.zeros(shape, jnp.int32)
    neg = jnp.full(shape, NEG, jnp.int32)
    big = jnp.full(shape, BIG, jnp.int32)

    # virtual row 0: H = 0 everywhere, start(col j+1) = j+1, F = NEG
    def init_body(j, _):
        Hrow[j] = zero
        Srow[j] = zero + (j + 1)
        Frow[j] = neg
        return 0

    jax.lax.fori_loop(0, N, init_body, 0)

    nb = Mp // rb

    def block_body(ib, trackers):
        qrows = [q_ref[ib * rb + r] for r in range(rb)]

        def one_col(j, carry):
            Hfl, Hlt, Slt, Sfl, E, SE, top_Hl, top_Sl, trk = carry
            bm, sm, jm, rm, fin, fin_j, fin_s = trk
            d = d_ref[j]
            d_on = j < dlen

            top_H = Hrow[j]
            top_S = Srow[j]
            top_F = Frow[j]

            diag_H = top_Hl  # H_final(above row, j-1)
            diag_S = top_Sl
            above_H = top_H  # H_final(above row, j)
            above_S = top_S
            above_F = top_F

            nHfl = [None] * rb
            nHlt = [None] * rb
            nSlt = [None] * rb
            nSfl = [None] * rb
            nE = [None] * rb
            nSE = [None] * rb

            for r in range(rb):
                i = ib * rb + r + 1  # 1-based DP row (traced scalar)
                row_on = i <= qlen
                is_first = i == 1

                s = jnp.where(qrows[r] == d, match, -mismatch)
                s = jnp.where((qrows[r] >= 4) | (d >= 4), 0, s)
                s = jnp.where(d_on, s, NEG)

                fresh = jnp.where(is_first, 0, -clip)
                use_fresh = fresh > diag_H
                dv = jnp.where(use_fresh, fresh, diag_H)
                dstart = jnp.where(use_fresh, zero + j, diag_S)
                M_cand = dv + s

                F_new = jnp.maximum(above_H - go, above_F - ge)

                use_M = M_cand >= F_new
                H_tmp = jnp.where(use_M, M_cand, F_new)
                S_tmp = jnp.where(use_M, dstart, above_S)

                # E(j) = max(E(j-1) - ge, H_tmp(j-1) - go); ties take fresh
                take_fresh = Hlt[r] - go >= E[r] - ge
                E_new = jnp.where(take_fresh, Hlt[r] - go, E[r] - ge)
                SE_new = jnp.where(take_fresh, Slt[r], SE[r])

                use_E = E_new > H_tmp
                H_fin = jnp.where(use_E, E_new, H_tmp)
                S_fin = jnp.where(use_E, SE_new, S_tmp)

                # frozen rows (i > qlen) pass the state straight through
                H_fin = jnp.where(row_on, H_fin, above_H)
                S_fin = jnp.where(row_on, S_fin, above_S)
                F_out = jnp.where(row_on, F_new, above_F)

                # clip-end candidates (i < qlen): lexicographic
                # (value desc, row asc, column asc) running best
                mid = row_on & (i < qlen) & d_on
                cand = H_fin - clip
                improve = mid & ((cand > bm) | ((cand == bm) & (i < rm)))
                bm = jnp.where(improve, cand, bm)
                sm = jnp.where(improve, S_fin, sm)
                jm = jnp.where(improve, j + 1, jm)
                rm = jnp.where(improve, i, rm)

                # final row: smallest column among maxima
                at_last = (i == qlen) & d_on
                better = at_last & (H_fin > fin)
                fin = jnp.where(better, H_fin, fin)
                fin_j = jnp.where(better, j + 1, fin_j)
                fin_s = jnp.where(better, S_fin, fin_s)

                nHfl[r] = H_fin
                nHlt[r] = jnp.where(row_on, H_tmp, Hlt[r])
                nSlt[r] = jnp.where(row_on, S_tmp, Slt[r])
                nSfl[r] = S_fin
                nE[r] = jnp.where(row_on, E_new, E[r])
                nSE[r] = jnp.where(row_on, SE_new, SE[r])

                diag_H = Hfl[r]  # this row's j-1 final is the next row's diag
                diag_S = Sfl[r]
                above_H = H_fin
                above_S = S_fin
                above_F = F_out

            Hrow[j] = above_H
            Srow[j] = above_S
            Frow[j] = above_F

            return (
                nHfl, nHlt, nSlt, nSfl, nE, nSE, top_H, top_S,
                (bm, sm, jm, rm, fin, fin_j, fin_s),
            )

        def col_body(jc, carry):
            for u in range(cu):
                carry = one_col(jc * cu + u, carry)
            return carry

        top_Hl0 = jnp.where(ib == 0, zero, neg)  # H(above row, col 0)
        init = (
            [neg] * rb, [neg] * rb, [zero] * rb, [zero] * rb,
            [neg] * rb, [zero] * rb,
            top_Hl0, zero, trackers,
        )
        return jax.lax.fori_loop(0, N // cu, col_body, init)[8]

    trackers = (neg, zero, zero, big, neg, zero, zero)
    bm, sm, jm, rm, fin, fin_j, fin_s = jax.lax.fori_loop(0, nb, block_body, trackers)

    use_clip = bm > fin
    score_ref[0] = jnp.where(qlen > 0, jnp.where(use_clip, bm, fin), 0)
    begin_ref[0] = jnp.where(use_clip, sm, fin_s)
    end_ref[0] = jnp.where(use_clip, jm, fin_j)


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap_open", "gap_extend", "clip", "interpret",
        "r_block", "col_unroll",
    ),
)
def sw_align_rot(
    queries: jnp.ndarray,  # [B, M] codes (pad 5)
    q_lens: jnp.ndarray,  # [B]
    databases: jnp.ndarray,  # [B, N]
    d_lens: jnp.ndarray,  # [B]
    match: int = SCORE_MATCH,
    mismatch: int = SCORE_MISMATCH,
    gap_open: int = SCORE_GAP_OPEN,
    gap_extend: int = SCORE_GAP_EXTEND,
    clip: int = SCORE_CLIP,
    interpret: bool = False,
    r_block: int = R_BLOCK,
    col_unroll: int = COL_UNROLL,
):
    B, M = queries.shape
    _, N = databases.shape
    pad_b = (-B) % BT
    pad_m = (-M) % r_block
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)), constant_values=5)
        databases = jnp.pad(databases, ((0, pad_b), (0, 0)), constant_values=5)
        q_lens = jnp.pad(q_lens, (0, pad_b))
        d_lens = jnp.pad(d_lens, (0, pad_b))
    if pad_m:
        queries = jnp.pad(queries, ((0, 0), (0, pad_m)), constant_values=5)
    Bp, Mp = B + pad_b, M + pad_m
    G = Bp // BT

    # [B, X] -> [G*X, 8, 128]: per-tile row-major layout, batch in (sub, lane)
    def to_tiles(x, X):
        return (
            x.astype(jnp.int32)
            .reshape(G, 8, 128, X)
            .transpose(0, 3, 1, 2)
            .reshape(G * X, 8, 128)
        )

    qt = to_tiles(queries, Mp)
    dt = to_tiles(databases, N)
    qlt = to_tiles(q_lens.reshape(-1, 1), 1)
    dlt = to_tiles(d_lens.reshape(-1, 1), 1)

    cu = col_unroll
    while N % cu:
        cu //= 2
    kernel = functools.partial(
        _sw_rot_kernel,
        Mp=Mp, N=N,
        match=match, mismatch=mismatch, go=gap_open, ge=gap_extend, clip=clip,
        rb=r_block, cu=max(1, cu),
    )
    out_shape = [jax.ShapeDtypeStruct((G, 8, 128), jnp.int32)] * 3
    score, begin, end = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Mp, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((N, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0))] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N, 8, 128), jnp.int32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qt, qlt, dt, dlt)

    def back(x):
        return x.reshape(Bp)[:B]

    return back(score), back(begin), back(end)
