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

    old = current_options()
    try:
        set_options(replace(old, native_aligner="on"))
        out_nat = genotype_sv(fasta, sv_vcf, [carrier, homref], f"{chrom}:1-{L}",
                              str(tmp_path / "out_nat"), avg_cov_by_readlen=avg)
        set_options(replace(old, native_aligner="off"))
        out_py = genotype_sv(fasta, sv_vcf, [carrier, homref], f"{chrom}:1-{L}",
                             str(tmp_path / "out_py"), avg_cov_by_readlen=avg)
    finally:
        set_options(old)

    body_nat = _body(out_nat)
    body_py = _body(out_py)
    assert body_nat, "no SV records emitted"
    assert body_nat == body_py
