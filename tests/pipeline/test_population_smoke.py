"""Population-scale smoke: a 120-sample cohort runs the full 3-iteration
pipeline through the pool fan-out (multi-pool split, threaded per-file
discovery, streamed pool merge) and emits every sample column."""

import gzip

from graphtyper_tpu.pipeline.genotype import genotype
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def test_120_sample_cohort(tmp_path):
    cfg = SimConfig(region_length=15_000, coverage=5.0, seed=37, n_samples=120, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    out = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-15000", str(tmp_path / "out"))
    text = gzip.open(out, "rt").read()
    hdr = [l for l in text.splitlines() if l.startswith("#CHROM")][0]
    assert len(hdr.split("\t")) - 9 == 120
    body = [l for l in text.splitlines() if not l.startswith("#")]
    assert body, "cohort produced no records"
    # every record carries all 120 genotype columns
    assert all(len(l.split("\t")) == 9 + 120 for l in body)
