"""SV coverage-filter parity: with avg_cov_by_readlen set (activating the
50bp/3x coverage-bin read filter, hts_parallel_reader.cpp:599-633), the
native batch aligner's metadata-only bin pre-pass must reproduce the Python
per-read loop's alignment decisions exactly — identical VCF bodies."""

import gzip
from dataclasses import replace

import numpy as np

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.pipeline.genotype import genotype_sv
from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta
from tests.pipeline.test_sv_e2e import _sim_reads, _write_sv_vcf


def _body(path):
    return [l for l in gzip.open(path, "rt").read().splitlines() if not l.startswith("#")]


def test_sv_coverage_filter_native_vs_python(tmp_path):
    rng = np.random.default_rng(11)
    L = 8000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    del_start0 = 3000
    size = 150
    sv_vcf = str(tmp_path / "sv.vcf")
    _write_sv_vcf(sv_vcf, chrom, del_start0 + 1, chr(seq[del_start0]), size, del_start0 + 1 + size)

    hap_ref = seq
    hap_del = np.concatenate([seq[: del_start0 + 1], seq[del_start0 + 1 + size :]])
    carrier = str(tmp_path / "carrier.sam")
    homref = str(tmp_path / "homref.sam")
    # deep enough that a low avg_cov cap actually rejects reads in hot bins
    _sim_reads(carrier, chrom, L, [hap_ref, hap_del], 1400, "carrier", 1)
    _sim_reads(homref, chrom, L, [hap_ref, hap_ref], 1400, "homref", 2)
    # cap ~= avg_cov*50*3: pick avg low enough to trip (true cov ~44x here)
    avg = [0.08, 0.08]

    # three paths must agree byte-for-byte: the fully-native SV pooled loop
    # (gt_call_pool_sv), the Python loop + native batch aligner (bin
    # decisions replayed by the metadata pre-pass), and the pure-Python loop
    variants = [
        ("pooled", dict(native_caller="on", native_aligner="on")),
        ("batch_align", dict(native_caller="off", native_aligner="on")),
        ("python", dict(native_caller="off", native_aligner="off")),
    ]
    old = current_options()
    bodies = {}
    try:
        for name, kw in variants:
            set_options(replace(old, **kw))
            out = genotype_sv(fasta, sv_vcf, [carrier, homref], f"{chrom}:1-{L}",
                              str(tmp_path / f"out_{name}"), avg_cov_by_readlen=avg)
            bodies[name] = _body(out)
    finally:
        set_options(old)

    assert bodies["pooled"], "no SV records emitted"
    assert bodies["pooled"] == bodies["batch_align"] == bodies["python"]

    # BAM inputs route through the BAM-bytes fast path (gt_call_finish_sv:
    # sv_bad from raw records + native bins/depth) — must match the rest
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.io.bam_writer import write_bam

    bams = []
    for sam in (carrier, homref):
        header, reads = read_alignments(sam, parse_tags=True)
        bam = sam[:-4] + ".bam"
        write_bam(bam, header, list(reads))
        bams.append(bam)
    try:
        set_options(replace(old, native_caller="on", native_aligner="on"))
        out_bam = genotype_sv(fasta, sv_vcf, bams, f"{chrom}:1-{L}",
                              str(tmp_path / "out_bam"), avg_cov_by_readlen=avg)
    finally:
        set_options(old)
    assert _body(out_bam) == bodies["pooled"]
