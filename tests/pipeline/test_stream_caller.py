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
