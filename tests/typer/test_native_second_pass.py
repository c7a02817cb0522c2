"""Parity: the native discovery second pass (gt_second_pass +
read_reads_into_buckets_native) must reproduce the Python
read_reads_into_buckets path exactly — same realignment outcomes, same
emitted discovery VCF. Reference: src/typer/caller.cpp:2232-2510."""

import numpy as np
import pytest

from graphtyper_tpu.typer import native_discovery


def _discover(sim, cfg, monkeypatch, force_python: bool):
    from graphtyper_tpu.typer.discovery import streamlined_discovery

    if force_python:
        monkeypatch.setattr(
            native_discovery, "read_reads_into_buckets_native", lambda *a, **k: None
        )
    names: list[str] = []
    vcf = streamlined_discovery(sim.sams, sim.fasta, f"{cfg.chrom}:1-{cfg.region_length}", names)
    return [
        (v.abs_pos, tuple(v.seqs), v.type, dict(v.infos)) for v in vcf.variants
    ]


@pytest.mark.skipif(not native_discovery.available(), reason="native lib unavailable")
def test_second_pass_native_matches_python(tmp_path, monkeypatch):
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    # 18x coverage leaves some indels without good support, so the
    # realignment second pass actually triggers (verified: the native path
    # builds ~3000 buckets on this seed)
    cfg = SimConfig(region_length=150_000, coverage=18.0, seed=11, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    spy_calls = []
    orig = native_discovery.read_reads_into_buckets_native

    def spy(*a, **k):
        out = orig(*a, **k)
        spy_calls.append(out is not None)
        return out

    monkeypatch.setattr(native_discovery, "read_reads_into_buckets_native", spy)
    got = _discover(sim, cfg, monkeypatch, force_python=False)
    assert spy_calls and all(spy_calls), "native second pass did not run"
    monkey_variants = _discover(sim, cfg, monkeypatch, force_python=True)
    assert got == monkey_variants
    assert len(got) > 0
