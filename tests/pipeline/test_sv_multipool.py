"""Multi-pool SV genotyping (max_files_open splits the cohort): per-pool
reformat + batch merge must reproduce the single-pool output — the
reference's per-job behavior (hts_parallel_reader.cpp:1003-1005 reformat
inside each job, then the standard pool VCF merge)."""

import gzip
from dataclasses import replace

import numpy as np

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.pipeline.genotype import genotype_sv
from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta
from tests.pipeline.test_sv_e2e import _sim_reads, _write_sv_vcf


def _body(path):
    return [l for l in gzip.open(path, "rt").read().splitlines() if not l.startswith("#")]


def test_sv_multipool_matches_single_pool(tmp_path):
    rng = np.random.default_rng(23)
    L = 8000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    del_start0 = 3000
    size = 150
    sv_vcf = str(tmp_path / "sv.vcf")
    _write_sv_vcf(sv_vcf, chrom, del_start0 + 1, chr(seq[del_start0]), size, del_start0 + 1 + size)

    hap_del = np.concatenate([seq[: del_start0 + 1], seq[del_start0 + 1 + size :]])
    sams = []
    for s in range(5):
        p = str(tmp_path / f"s{s}.sam")
        haps = [seq, hap_del] if s % 2 == 0 else [seq, seq]
        _sim_reads(p, chrom, L, haps, 500, f"s{s}", 100 + s)
        sams.append(p)

    region = f"{chrom}:1-{L}"
    old = current_options()
    try:
        set_options(replace(old, max_files_open=2))  # 3 pools of 2/2/1
        out_multi = genotype_sv(fasta, sv_vcf, sams, region, str(tmp_path / "out_multi"))
        set_options(replace(old, max_files_open=64))
        out_single = genotype_sv(fasta, sv_vcf, sams, region, str(tmp_path / "out_single"))
    finally:
        set_options(old)

    body_multi = _body(out_multi)
    assert body_multi, "no SV records emitted"
    assert body_multi == _body(out_single)

    # with the coverage filter active, bins are pool-local (reference
    # per-job semantics) so calls may shift — but the record set (which is
    # graph-derived) must align and the merge must succeed
    avg = [0.12] * len(sams)
    try:
        set_options(replace(old, max_files_open=2))
        out_mc = genotype_sv(fasta, sv_vcf, sams, region, str(tmp_path / "out_mc"),
                             avg_cov_by_readlen=avg)
        set_options(replace(old, max_files_open=64))
        out_sc = genotype_sv(fasta, sv_vcf, sams, region, str(tmp_path / "out_sc"),
                             avg_cov_by_readlen=avg)
    finally:
        set_options(old)
    keys_mc = [l.split("\t")[:5] for l in _body(out_mc)]
    keys_sc = [l.split("\t")[:5] for l in _body(out_sc)]
    assert keys_mc == keys_sc and keys_mc
