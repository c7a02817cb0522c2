"""Streaming pooled caller parity: the bounded-memory BGZF-stream + heap
path (gt_stream_*) must produce byte-identical output to the in-memory
caller. Reference design: src/utilities/hts_parallel_reader.cpp:85-136
(heap merge), hts_reader.cpp:166-235 (same-position seq sort)."""

import gzip
from dataclasses import replace

import pytest

from graphtyper_tpu.pipeline import native_caller


@pytest.mark.skipif(not native_caller.available(), reason="native lib unavailable")
def test_stream_caller_matches_in_memory(tmp_path):
    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    # multi-sample pool so the heap actually merges several files, with a
    # tiny batch size so batches + cross-batch carry (dedup runs, pending
    # mates, eps saturation) are all exercised
    cfg = SimConfig(region_length=40_000, coverage=12.0, seed=17, n_samples=3, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)

    base = current_options()
    outs = {}
    try:
        import graphtyper_tpu.pipeline.native_caller as nc

        orig = nc.run_native_call_pool_stream
        calls = []

        def spy(*a, **kw):
            kw["batch_records"] = 1500  # force many batches
            out = orig(*a, **kw)
            calls.append(out is not None)
            return out

        nc.run_native_call_pool_stream = spy
        for mode in ("off", "on"):
            set_options(replace(base, streaming_caller=mode))
            out = genotype(
                sim.fasta, sim.sams, f"{cfg.chrom}:1-40000", str(tmp_path / f"o_{mode}")
            )
            outs[mode] = gzip.open(out, "rb").read()
        assert calls and all(calls), "streaming caller did not run"
    finally:
        nc.run_native_call_pool_stream = orig
        set_options(base)
    assert outs["on"] == outs["off"]
    assert len(outs["on"]) > 1000


@pytest.mark.skipif(not native_caller.available(), reason="native lib unavailable")
def test_stream_spill_replay_parity(tmp_path, monkeypatch):
    """Cross-iteration staged-batch spill (GT_STREAM_SPILL=1): iteration 2
    writes frames + completion trailer, iteration 3 replays them — the final
    VCF must be byte-identical to the no-spill run, and the replay must
    actually engage (spill file created with a valid trailer, iteration 3's
    key matches)."""
    import os

    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=40_000, coverage=12.0, seed=23, n_samples=3, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)

    base = current_options()
    import graphtyper_tpu.pipeline.native_caller as nc

    orig = nc.run_native_call_pool_stream
    spills = []

    def spy(*a, **kw):
        kw["batch_records"] = 1500  # many frames per spill
        sp = kw.get("stream_spill")
        if sp is not None:
            spills.append((sp, os.path.exists(sp)))
        return orig(*a, **kw)

    outs = {}
    try:
        nc.run_native_call_pool_stream = spy
        set_options(replace(base, streaming_caller="on"))
        for mode in ("0", "1"):
            monkeypatch.setenv("GT_STREAM_SPILL", mode)
            out = genotype(
                sim.fasta, sim.sams, f"{cfg.chrom}:1-40000", str(tmp_path / f"s_{mode}")
            )
            outs[mode] = gzip.open(out, "rb").read()
    finally:
        nc.run_native_call_pool_stream = orig
        set_options(base)
    # spill runs saw: iteration 2 with no pre-existing spill (write), then
    # iteration 3 with the file present (replay)
    engaged = [existed for sp, existed in spills]
    assert engaged.count(False) >= 1 and engaged.count(True) >= 1, spills
    assert outs["0"] == outs["1"]


@pytest.mark.skipif(not native_caller.available(), reason="native lib unavailable")
def test_stream_spill_corrupt_falls_back(tmp_path, monkeypatch):
    """A truncated/trailerless spill must be rejected at attach (no trailer)
    and the stream must produce correct output from the BAMs."""
    import os

    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=30_000, coverage=10.0, seed=29, n_samples=2, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    base = current_options()
    import graphtyper_tpu.pipeline.native_caller as nc

    orig = nc.run_native_call_pool_stream

    def spy(*a, **kw):
        sp = kw.get("stream_spill")
        if sp is not None and os.path.exists(sp):
            # corrupt: drop the trailer + some tail bytes after iteration 2
            with open(sp, "r+b") as f:
                f.truncate(max(8, os.path.getsize(sp) - 64))
        return orig(*a, **kw)

    try:
        nc.run_native_call_pool_stream = spy
        set_options(replace(base, streaming_caller="on"))
        monkeypatch.setenv("GT_STREAM_SPILL", "1")
        out_spill = genotype(
            sim.fasta, sim.sams, f"{cfg.chrom}:1-30000", str(tmp_path / "corrupt")
        )
        nc.run_native_call_pool_stream = orig
        monkeypatch.setenv("GT_STREAM_SPILL", "0")
        out_ref = genotype(
            sim.fasta, sim.sams, f"{cfg.chrom}:1-30000", str(tmp_path / "ref")
        )
    finally:
        nc.run_native_call_pool_stream = orig
        set_options(base)
    assert gzip.open(out_spill, "rb").read() == gzip.open(out_ref, "rb").read()
