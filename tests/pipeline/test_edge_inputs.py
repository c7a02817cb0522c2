"""Edge inputs the reference tolerates: read-free samples, regions past the
contig end (clamped), N-run references (graph build skips N alts; reads over
Ns align nowhere), and a single-read input."""

import gzip

import numpy as np

from graphtyper_tpu.pipeline.genotype import genotype
from graphtyper_tpu.utils.simulate import SimConfig, _random_seq, _write_fasta, simulate_cohort


def _write_sam(path, chrom, L, records):
    with open(path, "w") as f:
        f.write(f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:{L}\n@RG\tID:rg\tSM:s1\n")
        for line in records:
            f.write(line + "\n")


def test_zero_read_sample(tmp_path):
    """A sample with no reads yields an empty (header-only) output, not a
    crash."""
    rng = np.random.default_rng(3)
    L = 6000
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, "chrE", seq)
    sam = str(tmp_path / "empty.sam")
    _write_sam(sam, "chrE", L, [])
    out = genotype(fasta, [sam], f"chrE:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert body == []


def test_region_past_contig_end_clamps(tmp_path):
    cfg = SimConfig(region_length=6000, coverage=12.0, seed=11, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    # ask far past the 6kb contig: the pipeline clamps and still genotypes
    out = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-5000000", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert body, "clamped region produced no records"
    assert all(int(l.split("\t")[1]) <= 6000 for l in body)


def test_n_run_reference(tmp_path):
    """A reference with an N block: reads over it align nowhere, flanking
    variants still call."""
    rng = np.random.default_rng(13)
    L = 8000
    seq = _random_seq(rng, L)
    seq[3000:3400] = ord("N")
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, "chrN", seq)
    # reads from a haplotype with a SNP left of the N block
    hap = seq.copy()
    p = 1500
    hap[p] = ord("ACGT"[(b"ACGT".index(hap[p : p + 1].tobytes()) + 1) % 4])
    recs = []
    read_len, frag = 125, 320
    for i in range(800):
        start = int(rng.integers(0, L - frag))
        r1 = hap[start : start + read_len].tobytes().decode()
        p2 = start + frag - read_len
        r2 = hap[p2 : p2 + read_len].tobytes().decode()
        q = "I" * read_len
        recs.append((start, f"r{i}\t99\tchrN\t{start + 1}\t60\t{read_len}M\t=\t{p2 + 1}\t{frag}\t{r1}\t{q}"))
        recs.append((p2, f"r{i}\t147\tchrN\t{p2 + 1}\t60\t{read_len}M\t=\t{start + 1}\t{-frag}\t{r2}\t{q}"))
    recs.sort(key=lambda t: t[0])
    sam = str(tmp_path / "n.sam")
    _write_sam(sam, "chrN", L, [l for _, l in recs])
    out = genotype(fasta, [sam], f"chrN:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert any(int(l.split("\t")[1]) == p + 1 for l in body), "flanking SNP not called"


def test_single_read_input(tmp_path):
    rng = np.random.default_rng(17)
    L = 5000
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, "chr1R", seq)
    r = seq[1000:1125].tobytes().decode()
    sam = str(tmp_path / "one.sam")
    _write_sam(sam, "chr1R", L, [f"r0\t0\tchr1R\t1001\t60\t125M\t*\t0\t0\t{r}\t" + "I" * 125])
    out = genotype(fasta, [sam], f"chr1R:1-{L}", str(tmp_path / "out"))
    # a single perfect read discovers nothing; header-only output is correct
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert body == []
