"""The native ranged BGZF extraction (io/bai._extract_ranges_native) must be
byte-identical to the Python BgzfReader walk for every region slice — random
regions over a simulated indexed BAM, including block-boundary and
empty-range shapes."""

import numpy as np
import pytest

from graphtyper_tpu.io import bai as bai_mod
from graphtyper_tpu.io.bai import ensure_bai, read_region_bam_bytes
from graphtyper_tpu.io.native import get_lib
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native library unavailable")


def test_native_ranges_match_python(tmp_path, monkeypatch):
    cfg = SimConfig(region_length=120_000, coverage=25.0, seed=13, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    bam = sim.sams[0]
    assert ensure_bai(bam, min_size=0)

    rng = np.random.default_rng(3)
    regions = [(int(b), int(b + rng.integers(1, 40_000))) for b in rng.integers(0, 110_000, size=12)]
    regions += [(0, 1), (119_999, 120_000), (0, 120_000)]
    for beg, end in regions:
        native = read_region_bam_bytes(bam, [(cfg.chrom, beg, end)])
        assert native is not None
        monkeypatch.setattr(bai_mod, "_extract_ranges_native", lambda *a, **k: None)
        python = read_region_bam_bytes(bam, [(cfg.chrom, beg, end)])
        monkeypatch.undo()
        assert native == python, (beg, end, len(native), len(python))
