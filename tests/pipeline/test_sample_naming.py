"""Sample ordering and naming parity:
- shrunk inputs reorder lexicographically by input basename unless
  --no_sample_name_reordering (genotype.cpp:394);
- --get_sample_names_from_filename skips RG parsing so samples are named by
  file (hts_reader.cpp:32)."""

import gzip
import shutil
from dataclasses import replace

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.pipeline.genotype import genotype
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def _samples_of(path):
    for l in gzip.open(path, "rt"):
        if l.startswith("#CHROM"):
            return l.rstrip("\n").split("\t")[9:]
    return []


def test_sample_name_reordering(tmp_path):
    cfg = SimConfig(region_length=20_000, coverage=18.0, seed=5, n_samples=2, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    # rename so the input order is NOT the lexicographic basename order
    zz = str(tmp_path / "zz_first.bam")
    aa = str(tmp_path / "aa_second.bam")
    shutil.copyfile(sim.sams[0], zz)
    shutil.copyfile(sim.sams[1], aa)

    out = genotype(sim.fasta, [zz, aa], f"{cfg.chrom}:1-20000", str(tmp_path / "out"))
    names = _samples_of(out)
    assert len(names) == 2
    # rerun with reordering off and observe the column flip (aa_second.bam
    # sorts before zz_first.bam, so default order is reversed input order)
    old = current_options()
    try:
        set_options(replace(old, no_sample_name_reordering=True))
        out2 = genotype(sim.fasta, [zz, aa], f"{cfg.chrom}:1-20000", str(tmp_path / "out2"))
    finally:
        set_options(old)
    names2 = _samples_of(out2)
    assert names2 == list(reversed(names)), (names, names2)


def test_sample_names_from_filename(tmp_path):
    cfg = SimConfig(region_length=15_000, coverage=15.0, seed=6, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    dst = str(tmp_path / "mylib.bam")
    shutil.copyfile(sim.sams[0], dst)
    old = current_options()
    try:
        set_options(replace(old, get_sample_names_from_filename=True))
        out = genotype(sim.fasta, [dst], f"{cfg.chrom}:1-15000", str(tmp_path / "out"))
    finally:
        set_options(old)
    names = _samples_of(out)
    # bamshrink writes index-named temps; the name derives from the shrunk
    # file read by the pool, never from the RG SM tag
    assert names and all("sample" not in n for n in names), names


def test_normal_and_no_variant_overlapping(tmp_path):
    """--normal_and_no_variant_overlapping emits a second, non-overlapping
    decomposition next to the main output (genotype.cpp:594-658)."""
    cfg = SimConfig(region_length=20_000, coverage=20.0, seed=9, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    old = current_options()
    try:
        set_options(replace(old, normal_and_no_variant_overlapping=True))
        out = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-20000", str(tmp_path / "out"))
    finally:
        set_options(old)
    second = out[: -len(".vcf.gz")] + ".no_variant_overlapping.vcf.gz"
    import os

    assert os.path.exists(second), second
    main_body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    novl_body = [l for l in gzip.open(second, "rt") if not l.startswith("#")]
    assert main_body and novl_body
