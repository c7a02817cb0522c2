"""SV streaming caller parity + bounded memory (VERDICT r3 #6).

The bounded-RSS BGZF-stream caller now takes SV graphs: the is_good_sv_read
gate and region position filter apply per record in the stream, the 50bp/3x
coverage bins and ReferenceDepth persist across batches, and leftover mates
resolve at finish from the persistent pending maps. Reference design:
src/utilities/hts_parallel_reader.cpp:528-568 (gate), :599-633 (bins),
:719-772 (leftover mates)."""

import gzip
import os
import resource
from dataclasses import replace

import numpy as np
import pytest

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.pipeline import native_caller
from graphtyper_tpu.pipeline.genotype import genotype_sv
from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta
from tests.pipeline.test_sv_e2e import _sim_reads, _write_sv_vcf

pytestmark = pytest.mark.skipif(not native_caller.available(), reason="native lib unavailable")


def _body(path):
    return [l for l in gzip.open(path, "rt").read().splitlines() if not l.startswith("#")]


def _sam_to_bam(sam_path: str) -> str:
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.io.bam_writer import write_bam

    header, reads = read_alignments(sam_path, parse_tags=True)
    bam = sam_path[:-4] + ".bam"
    write_bam(bam, header, reads)
    return bam


def _sv_fixture(tmp_path, n_samples: int = 4, pairs: int = 900):
    rng = np.random.default_rng(31)
    L = 9000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)
    del_start0 = 4000
    size = 180
    sv_vcf = str(tmp_path / "sv.vcf")
    _write_sv_vcf(sv_vcf, chrom, del_start0 + 1, chr(seq[del_start0]), size,
                  del_start0 + 1 + size)
    hap_ref = seq
    hap_del = np.concatenate([seq[: del_start0 + 1], seq[del_start0 + 1 + size :]])
    bams = []
    for i in range(n_samples):
        sam = str(tmp_path / f"s{i}.sam")
        haps = [hap_ref, hap_del] if i % 2 == 0 else [hap_ref, hap_ref]
        _sim_reads(sam, chrom, L, haps, pairs, f"s{i}", i + 1)
        bams.append(_sam_to_bam(sam))
    return fasta, sv_vcf, bams, chrom, L


def test_sv_stream_matches_in_memory(tmp_path):
    """genotype_sv output is byte-identical with the streaming caller forced
    on (tiny batches: cross-batch bins, pending mates, dedup carry) vs the
    in-memory native SV pooled loop, with the coverage filter active."""
    fasta, sv_vcf, bams, chrom, L = _sv_fixture(tmp_path)
    avg = [0.15] * len(bams)

    import graphtyper_tpu.pipeline.native_caller as nc

    orig = nc.run_native_call_pool_stream
    calls = []

    def spy(*a, **kw):
        kw["batch_records"] = 700  # force many batches
        out = orig(*a, **kw)
        calls.append(out is not None)
        return out

    base = current_options()
    bodies = {}
    try:
        nc.run_native_call_pool_stream = spy
        for mode in ("off", "on"):
            set_options(replace(base, streaming_caller=mode))
            out = genotype_sv(fasta, sv_vcf, bams, f"{chrom}:1-{L}",
                              str(tmp_path / f"out_{mode}"), avg_cov_by_readlen=avg)
            bodies[mode] = _body(out)
    finally:
        nc.run_native_call_pool_stream = orig
        set_options(base)
    assert calls and all(calls), "SV streaming caller did not run"
    assert bodies["on"] == bodies["off"]
    assert len(bodies["on"]) >= 3  # AGGREGATED + BREAKPOINT + COVERAGE rows


def test_sv_stream_region_gate(tmp_path):
    """The stream's per-record position filter reproduces the in-memory
    prep's padded-region record set (reads outside never touch the bins or
    the pool)."""
    fasta, sv_vcf, bams, chrom, L = _sv_fixture(tmp_path, n_samples=2, pairs=500)
    base = current_options()
    bodies = {}
    try:
        for mode in ("off", "on"):
            set_options(replace(base, streaming_caller=mode))
            out = genotype_sv(fasta, sv_vcf, bams, f"{chrom}:3000-6000",
                              str(tmp_path / f"og_{mode}"))
            bodies[mode] = _body(out)
    finally:
        set_options(base)
    assert bodies["on"] == bodies["off"] and len(bodies["on"]) >= 1


def test_sv_stream_rss_bounded(tmp_path):
    """A 12-sample SV pool streams with RSS growth far below the pool's
    decompressed footprint (the in-memory path loads it all)."""
    fasta, sv_vcf, bams, chrom, L = _sv_fixture(tmp_path, n_samples=12, pairs=1500)
    from graphtyper_tpu.graph.build import construct_graph
    from graphtyper_tpu.graph.coords import GenomicRegion
    from graphtyper_tpu.index.build import index_graph

    graph = construct_graph(fasta, sv_vcf, f"{chrom}:1-{L}", is_sv_graph=True, use_index=True)
    index = index_graph(graph)
    region = GenomicRegion.parse(f"{chrom}:1-{L}")

    def rss_mb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    # warm imports/scorer shapes once so the measured run sees steady state
    native_caller.run_native_call_pool_stream(
        graph, index, bams[:2], region, batch_records=600, avg_cov=[0.15, 0.15]
    )
    r0 = rss_mb()
    out = native_caller.run_native_call_pool_stream(
        graph, index, bams, region, batch_records=600, avg_cov=[0.15] * 12
    )
    assert out is not None
    assert out[4] is not None  # ReferenceDepth came back filled
    growth = rss_mb() - r0
    total_compressed = sum(os.path.getsize(p) for p in bams)
    assert growth < max(24.0, total_compressed / 1e6 * 1.5), growth
