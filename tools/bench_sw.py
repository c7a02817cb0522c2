"""Microbench + hardware parity check for the Pallas SW kernels.

Times inside jit via lax.scan run-length differencing (per-call dispatch
and readback over the axon tunnel would otherwise dominate), and checks
score/begin/end parity against the host DP on random batches on the real
device. Run from the repo root:

    python tools/bench_sw.py                # rotated kernel (production)
    python tools/bench_sw.py --rot RB CU    # rotated kernel, custom blocking
    python tools/bench_sw.py --row [bb] [R] # legacy row-scan kernel
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from graphtyper_tpu.ops.sw import align_batch
    from graphtyper_tpu.ops.sw_pallas import sw_align_pallas
    from graphtyper_tpu.ops.sw_rot import sw_align_rot

    argv = sys.argv[1:]
    use_row = argv and argv[0] == "--row"
    if use_row:
        argv = argv[1:]
    elif argv and argv[0] == "--rot":
        argv = argv[1:]
    if use_row:
        block_b = int(argv[0]) if argv else 128
        R = int(argv[1]) if len(argv) > 1 else 8

        def kern(qd, ql, dd, dl):
            return sw_align_pallas(qd, ql, dd, dl, block_b=block_b, rows_per_step=R)

        label = f"row-scan kernel (block_b={block_b}, R={R})"
    else:
        rb = int(argv[0]) if argv else 4
        cu = int(argv[1]) if len(argv) > 1 else 16

        def kern(qd, ql, dd, dl):
            return sw_align_rot(qd, ql, dd, dl, r_block=rb, col_unroll=cu)

        label = f"rotated kernel (r_block={rb}, col_unroll={cu})"
    B, M, N = 4096, 152, 256
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, M)).astype(np.uint8)
    d = rng.integers(0, 4, (B, N)).astype(np.uint8)
    # half the queries are noisy copies of database windows (realistic hits)
    for i in range(0, B, 2):
        off = rng.integers(0, N - M)
        q[i] = d[i, off : off + M]
        for _ in range(4):
            q[i, rng.integers(0, M)] = rng.integers(0, 4)
    qlens = np.full(B, M, np.int32)
    qlens[rng.integers(0, B, B // 8)] = rng.integers(32, M, B // 8)
    dlens = np.full(B, N, np.int32)
    dlens[rng.integers(0, B, B // 8)] = rng.integers(M, N, B // 8)

    print("backend:", jax.default_backend())

    # ---- parity on hardware ----
    s, bg, en = kern(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(d), jnp.asarray(dlens)
    )
    host = align_batch(q, qlens, d, dlens, device=False)
    np.testing.assert_array_equal(np.asarray(s), host.score)
    np.testing.assert_array_equal(np.asarray(bg), host.database_begin)
    np.testing.assert_array_equal(np.asarray(en), host.database_end)
    print(f"parity OK on {B} alignments: {label}")

    # ---- throughput: scan-differenced ----
    def make_many(n_steps):
        @jax.jit
        def many(qd, ql, dd, dl):
            def body(c, i):
                s, b, e = kern(jnp.roll(qd, i, axis=0), ql, dd, dl)
                return c + s.sum() + b.sum() + e.sum(), None

            return jax.lax.scan(body, jnp.int32(0), jnp.arange(n_steps))[0]

        return many

    args = [jax.device_put(jnp.asarray(x)) for x in (q, qlens, d, dlens)]
    n_small, n_big = 4, 36
    small, big = make_many(n_small), make_many(n_big)
    float(small(*args))
    float(big(*args))
    per_step = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(small(*args))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(big(*args))
        tb = time.perf_counter() - t0
        per_step = min(per_step, (tb - ts) / (n_big - n_small))
    cells = float(qlens.astype(np.int64).sum() * N)  # valid DP cells per step
    print(
        f"{cells / per_step / 1e9:.2f} Gcell/s  ({per_step * 1e3:.2f} ms/batch of {B}, "
        f"padded cells {B * M * N / per_step / 1e9:.2f} G/s)"
    )


if __name__ == "__main__":
    main()
