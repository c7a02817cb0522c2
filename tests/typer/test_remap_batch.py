"""The vectorized call projection (_remap_calls_batch) must equal the scalar
_remap_call on every sample: min-PL through the pair-index map and
ceiling-clipped AD sums (variant.cpp _remap_call semantics)."""

import numpy as np

from graphtyper_tpu.typer.sample_call import SampleCall
from graphtyper_tpu.typer.variant import _remap_call, _remap_calls_batch


def test_remap_batch_matches_scalar():
    rng = np.random.default_rng(5)
    for trial in range(200):
        n_old = int(rng.integers(2, 7))
        n_new = int(rng.integers(1, n_old + 1))
        old2new = [0] + [int(rng.integers(0, n_new)) for _ in range(n_old - 1)]
        S = int(rng.integers(1, 9))
        P = n_old * (n_old + 1) // 2
        calls = [
            SampleCall(
                phred=rng.integers(0, 256, size=P).astype(np.int64),
                coverage=rng.integers(0, 0xFFFF, size=n_old).astype(np.int64),
                ambiguous_depth=int(rng.integers(0, 5)),
                alt_proper_pair_depth=int(rng.integers(0, 5)),
            )
            for _ in range(S)
        ]
        a = [_remap_call(c, n_old, n_new, old2new) for c in calls]
        b = _remap_calls_batch(calls, n_old, n_new, old2new)
        for x, y in zip(a, b):
            assert (np.asarray(x.phred) == np.asarray(y.phred)).all(), trial
            assert (np.asarray(x.coverage) == np.asarray(y.coverage)).all(), trial
            assert x.ambiguous_depth == y.ambiguous_depth
            assert x.ref_total_depth == y.ref_total_depth
