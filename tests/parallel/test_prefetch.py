"""Host->device prefetch pipeline tests (parallel/prefetch.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphtyper_tpu.parallel.prefetch import pipelined_map, prefetch_to_device


def test_prefetch_preserves_order_and_values():
    batches = [np.full((4,), i, dtype=np.float32) for i in range(10)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 10
    for i, o in enumerate(out):
        np.testing.assert_array_equal(np.asarray(o), batches[i])


def test_prefetch_propagates_producer_error():
    def gen():
        yield np.zeros(2, dtype=np.float32)
        raise RuntimeError("decode failed")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_pipelined_map_matches_serial():
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(8, 8)).astype(np.float32) for _ in range(6)]

    @jax.jit
    def step(x):
        return jnp.sum(x * x)

    piped = pipelined_map(lambda i: data[i], step, n_batches=6)
    serial = [step(d) for d in data]
    for a, b in zip(piped, serial):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pipelined_map_tuple_batches():
    data = [(np.ones((4,), np.float32) * i, np.ones((4,), np.float32)) for i in range(4)]

    @jax.jit
    def step(x, y):
        return (x + y).sum()

    out = pipelined_map(lambda i: data[i], step, n_batches=4)
    assert [float(o) for o in out] == [4.0, 8.0, 12.0, 16.0]
