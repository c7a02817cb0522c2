"""native/gt_sw.cpp vs the numpy DP oracle (ops/sw.py): bit-parity on
score/begin/end/clip_end across random batches, degenerate lengths, and
N-base inputs. The numpy DP defines the semantics; the C twin is the
production host path."""

import numpy as np
import pytest

from graphtyper_tpu.io.native import get_lib
from graphtyper_tpu.ops import sw

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib not built")


def _numpy_oracle(q, ql, d, dl, **kw):
    saved = sw._align_batch_native
    sw._align_batch_native = lambda *a, **k: None
    try:
        return sw.align_batch(q, ql, d, dl, device=False, **kw)
    finally:
        sw._align_batch_native = saved


def _assert_same(a, b):
    np.testing.assert_array_equal(a.score, b.score)
    np.testing.assert_array_equal(a.database_begin, b.database_begin)
    np.testing.assert_array_equal(a.database_end, b.database_end)
    np.testing.assert_array_equal(a.clip_end, b.clip_end)


def test_sw_native_random_differential():
    rng = np.random.default_rng(0)
    for trial in range(8):
        B = int(rng.integers(1, 200))
        M = int(rng.integers(8, 180))
        N = int(rng.integers(8, 300))
        q = rng.integers(0, 6, size=(B, M)).astype(np.uint8)  # incl. N/pad codes
        d = rng.integers(0, 6, size=(B, N)).astype(np.uint8)
        # half the queries are noisy windows of their database (realistic hits)
        for i in range(0, B, 2):
            if N > M:
                off = int(rng.integers(0, N - M))
                q[i] = d[i, off : off + M] % 4
        ql = rng.integers(0, M + 1, size=B).astype(np.int32)
        dl = rng.integers(0, N + 1, size=B).astype(np.int32)
        nat = sw.align_batch(q, ql, d, dl, device=False)
        ora = _numpy_oracle(q, ql, d, dl)
        _assert_same(nat, ora)


def test_sw_native_indel_cases():
    from graphtyper_tpu.utils.dna import encode

    db = encode(b"ACGTACGTACGTAAATTTCCCGGGACGTACGTACGT")
    # deletion in the query relative to db
    qr = encode(b"ACGTACGTACGTTTCCCGGGACGTACGTACGT")
    B, M, N = 1, len(qr), len(db)
    q = qr.reshape(1, -1).astype(np.uint8)
    d = db.reshape(1, -1).astype(np.uint8)
    ql = np.array([M], np.int32)
    dl = np.array([N], np.int32)
    nat = sw.align_batch(q, ql, d, dl, device=False)
    ora = _numpy_oracle(q, ql, d, dl)
    _assert_same(nat, ora)
    assert nat.score[0] > 0
