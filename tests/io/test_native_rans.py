"""Native rANS 4x8 decoder (native/gt_native.cpp gt_rans_decode) parity.

The interleaved byte-at-a-time renormalization loop is unvectorizable in
numpy, so CRAM decode runs it in C; the Python decoders (io/cram.py,
htslib rans_static.c semantics) remain the oracle. Differential over random
sizes/alphabets, including the symbol-255 RLE wraparound edge.
"""

import struct

import numpy as np
import pytest

from graphtyper_tpu.io import cram
from graphtyper_tpu.io.cram_writer import rans_encode_0, rans_encode_1
from graphtyper_tpu.io.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib not built")


def _cases(seed):
    rng = np.random.default_rng(seed)
    for trial in range(12):
        n = int(rng.integers(1, 120_000))
        kind = trial % 4
        if kind == 0:
            data = rng.integers(0, 256, size=n).astype(np.uint8)
        elif kind == 1:  # markovian quality-like stream (order-1's sweet spot)
            data = (np.clip(np.cumsum(rng.integers(-2, 3, size=n)) + 35, 5, 41) + 33).astype(
                np.uint8
            )
        elif kind == 2:  # high symbols incl. 255 (RLE wraparound edge)
            data = rng.integers(250, 256, size=n).astype(np.uint8)
        else:
            data = np.full(n, 77, dtype=np.uint8)
        yield data.tobytes()


def test_native_rans_order0_differential():
    for data in _cases(0):
        blob = rans_encode_0(data)
        out_size = struct.unpack_from("<I", blob, 5)[0]
        body = blob[9:]
        nat = cram._rans_decode_native(body, 0, out_size)
        assert nat is not None
        assert nat == cram._rans_decode_0(body, out_size) == data


def test_native_rans_order1_differential():
    for data in _cases(1):
        blob = rans_encode_1(data)
        out_size = struct.unpack_from("<I", blob, 5)[0]
        body = blob[9:]
        nat = cram._rans_decode_native(body, 1, out_size)
        assert nat is not None
        assert nat == cram._rans_decode_1(body, out_size) == data


def test_native_rans_malformed_returns_fallback():
    # truncated body: native must signal failure (None), not crash/overrun
    blob = rans_encode_0(b"hello world" * 100)
    out_size = struct.unpack_from("<I", blob, 5)[0]
    body = blob[9:30]
    assert cram._rans_decode_native(body, 0, out_size) is None
