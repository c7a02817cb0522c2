"""Driver benchmark: prints ONE JSON line.

Measures the flagship device compute path — the fused batched genotyping
step (read-vs-haplotype one-hot mismatch matmul + explains masking +
PL-triangle Gram update) — in reads aligned+genotyped per second per chip.

vs_baseline compares against the reference implementation's single-core
throughput proxy: graphtyper's AVX512-era design targets roughly 10k reads
aligned+genotyped/sec/core on its hot path (derived from published
population-scale runtimes: ~30x genome, ~50kb regions, minutes/sample-region
on deCODE's cluster; BASELINE.md notes no in-repo numbers exist).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_READS_PER_SEC_PER_CORE = 10_000.0


def main() -> None:
    import jax

    from graphtyper_tpu.ops.genotype_step import genotype_forward

    rng = np.random.default_rng(0)
    R, L, H, A = 8192, 160, 512, 16
    haps = rng.integers(0, 4, size=(H, L)).astype(np.uint8)
    src = rng.integers(0, H, size=R)
    reads = haps[src].copy()
    for k in range(2):
        reads[np.arange(R), rng.integers(0, L, size=R)] = rng.integers(0, 4, size=R).astype(np.uint8)
    hap_allele = np.zeros((H, A), dtype=np.float32)
    hap_allele[np.arange(H), rng.integers(0, A, size=H)] = 1.0
    eps = rng.integers(4, 9, size=R).astype(np.float32)

    reads_d = jax.device_put(reads)
    haps_d = jax.device_put(haps)
    hap_allele_d = jax.device_put(hap_allele)
    eps_d = jax.device_put(eps)

    # compile
    delta, B = genotype_forward(reads_d, haps_d, hap_allele_d, eps_d)
    delta.block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        delta, B = genotype_forward(reads_d, haps_d, hap_allele_d, eps_d)
    delta.block_until_ready()
    dt = time.perf_counter() - t0

    reads_per_sec = R * iters / dt
    print(
        json.dumps(
            {
                "metric": "device_genotype_reads_per_sec_per_chip",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / REFERENCE_READS_PER_SEC_PER_CORE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
