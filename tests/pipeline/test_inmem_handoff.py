"""The in-memory sites handoff between pipeline iterations
(graph/build.records_from_vcf_output) must produce output byte-identical to
the file round-trip (write bgzf+tabix, read back with VcfReader) — the file
stays on disk as the checkpoint either way."""

import gzip

from graphtyper_tpu.graph import build as graph_build
from graphtyper_tpu.pipeline.genotype import genotype
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def _body(path):
    return [l for l in gzip.open(path, "rt").read().splitlines() if not l.startswith("#")]


def test_inmem_handoff_matches_file_roundtrip(tmp_path, monkeypatch):
    cfg = SimConfig(region_length=60_000, coverage=30.0, seed=3, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    region = f"{cfg.chrom}:1-60000"

    out_mem = genotype(sim.fasta, sim.sams, region, str(tmp_path / "out_mem"))

    # force the file path: the handoff returns None -> construct_graph reads
    # the written final.vcf.gz exactly as before
    monkeypatch.setattr(graph_build, "records_from_vcf_output", lambda *a, **k: None)
    out_file = genotype(sim.fasta, sim.sams, region, str(tmp_path / "out_file"))

    body = _body(out_mem)
    assert body, "no records emitted"
    assert body == _body(out_file)
