"""genotype_regions: 50kb split + persistent process pool parity.

The reference genotypes in <=50kb units over a long-lived threaded region
loop (genotype.cpp:683-741, main.cpp:30-58); our analog is a persistent
spawn-process pool (pipeline/genotype.py:_region_pool). The pooled fan-out
must produce output identical to the serial loop, and the pool must be
reused across calls.
"""

import gzip
import os

from graphtyper_tpu.pipeline import genotype as G
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def _vcf_text(path):
    with gzip.open(path, "rt") as f:
        return [l for l in f if not l.startswith("##")]


def test_pooled_regions_match_serial(tmp_path):
    cfg = SimConfig(region_length=120_000, coverage=18.0, n_samples=2, seed=13, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    region = f"{cfg.chrom}:1-{cfg.region_length}"

    serial = G.genotype_regions(
        sim.fasta, sim.sams, region, str(tmp_path / "serial"), processes=1
    )
    pooled = G.genotype_regions(
        sim.fasta, sim.sams, region, str(tmp_path / "pooled"), processes=2
    )
    assert len(serial) == len(pooled) == 3
    assert G._POOL is not None, "persistent pool should be alive after the call"
    pool_before = G._POOL
    for a, b in zip(serial, pooled):
        assert os.path.basename(a) == os.path.basename(b)
        assert _vcf_text(a) == _vcf_text(b)

    # second call must REUSE the pool (no respawn) and still agree
    pooled2 = G.genotype_regions(
        sim.fasta, sim.sams, f"{cfg.chrom}:1-100000", str(tmp_path / "pooled2"), processes=2
    )
    assert G._POOL is pool_before
    assert len(pooled2) == 2
    for a, b in zip(serial, pooled2):
        assert _vcf_text(a) == _vcf_text(b)
