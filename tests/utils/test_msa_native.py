"""Native NW-edits (gt_sw.cpp gt_nw_edits) vs the numpy oracle DP: same
edits — positions, pieces, and the tie-rule-dependent gap placement — on
randomized ref/alt pairs including repeats, homopolymers, and pure indels."""

import numpy as np
import pytest

from graphtyper_tpu.io.native import get_lib
from graphtyper_tpu.utils.msa import _needleman_wunsch_edits_numpy, _nw_edits_native


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_nw_edits_native_matches_numpy():
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_checked = 0
    for trial in range(300):
        n = int(rng.integers(1, 60))
        ref = bytes(rng.choice(bases, n))
        # derive alt by mutating ref: SNPs, dels, ins, homopolymer stretches
        alt = bytearray(ref)
        for _ in range(int(rng.integers(0, 5))):
            kind = int(rng.integers(0, 3))
            if not alt:
                break
            p = int(rng.integers(0, len(alt)))
            if kind == 0:
                alt[p] = int(rng.choice(bases))
            elif kind == 1:
                del alt[p : p + int(rng.integers(1, 6))]
            else:
                ins = bytes(rng.choice(bases, int(rng.integers(1, 6))))
                alt[p:p] = ins
        if rng.random() < 0.2:  # homopolymer tail (classic tie territory)
            alt += b"A" * int(rng.integers(1, 8))
        alt = bytes(alt)
        if not alt:
            continue
        nat = _nw_edits_native(ref, alt)
        assert nat is not None
        assert nat == _needleman_wunsch_edits_numpy(ref, alt), (ref, alt)
        n_checked += 1
    assert n_checked > 250
