"""End-to-end tests for the camou and HLA modes (both WIP-level in the
reference, main.cpp:1378; these assert our implementations call correctly on
synthetic truth)."""

import gzip

import numpy as np
import pytest

from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def test_genotype_camou(tmp_path):
    """Camou mode: ploidy = 2 x intervals, no MAPQ filter, both-orientation
    alignment (genotype_camou.cpp:112, main.cpp:1243-1247). One interval with
    a het SNP must genotype; PLs are renormalized to the camou ploidy."""
    from graphtyper_tpu.pipeline.genotype_camou import genotype_camou

    cfg = SimConfig(region_length=6000, coverage=22.0, seed=17, snp_rate=1 / 800.0, indel_rate=0.0)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    bed = str(tmp_path / "intervals.bed")
    with open(bed, "w") as f:
        f.write(f"{cfg.chrom}\t1000\t5000\n")
    out = genotype_camou(sim.fasta, bed, sim.sams, str(tmp_path / "out"))
    assert out is not None
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    assert body, "camou produced no records"
    # truth: at least half of the simulated non-hom-ref SNPs inside the
    # interval are rediscovered
    truth_alt = [
        (pos, ref, alt)
        for (pos, ref, alt), gts in sim.truth.items()
        if 1000 <= pos < 5000 and any(g != (0, 0) for g in gts)
    ]
    called_pos = {int(l.split("\t")[1]) for l in body}
    hits = sum(1 for pos, _r, _a in truth_alt if (pos + 1) in called_pos)
    assert hits >= max(1, len(truth_alt) // 2), (hits, len(truth_alt))


def _write_hla_panel(path, chrom, sites, alleles):
    """Panel VCF: sample columns are HLA alleles; AD[0]=0 marks the allele as
    carrying the site's alt (genotype_hla.cpp:130-180 semantics)."""
    lines = [
        "##fileformat=VCFv4.2",
        f"##contig=<ID={chrom}>",
        '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="depth">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(a[0] for a in alleles),
    ]
    for i, (pos1, ref, alt) in enumerate(sites):
        cols = []
        for name, carried in alleles:
            cols.append("0,1" if i in carried else "1,0")
        lines.append(
            f"{chrom}\t{pos1}\t.\t{ref}\t{alt}\t.\t.\tGT_ID={i + 1};FEATURE=exon\tAD\t" + "\t".join(cols)
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_genotype_hla(tmp_path):
    """HLA mode: two-allele panel distinguished by two exon SNPs; a sample
    whose reads carry both panel alleles must genotype as A1/A2 in the <H>
    record."""
    from graphtyper_tpu.pipeline.genotype_hla import genotype_hla
    from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta

    rng = np.random.default_rng(23)
    L = 4000
    chrom = "chrH"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    # two SNP sites define the alleles
    p1, p2 = 1500, 1600
    ref1, ref2 = chr(seq[p1]), chr(seq[p2])
    alt1 = "ACGT"[("ACGT".index(ref1) + 1) % 4]
    alt2 = "ACGT"[("ACGT".index(ref2) + 1) % 4]
    panel = str(tmp_path / "hla.vcf")
    # A1 = reference allele at both sites; A2 carries both alts
    _write_hla_panel(
        panel, chrom, [(p1 + 1, ref1, alt1), (p2 + 1, ref2, alt2)], [("A1", set()), ("A2", {0, 1})]
    )

    hapA1 = seq.copy()
    hapA2 = seq.copy()
    hapA2[p1] = ord(alt1)
    hapA2[p2] = ord(alt2)

    # simulate a diploid A1/A2 sample
    sam = str(tmp_path / "sample.sam")
    records = []
    read_len, frag = 125, 320
    for i in range(600):
        hap = [hapA1, hapA2][i % 2]
        start = int(rng.integers(0, L - frag))
        r1 = hap[start : start + read_len].tobytes().decode()
        r2 = hap[start + frag - read_len : start + frag].tobytes().decode()
        q = "I" * read_len
        records.append((start, f"s_r{i}\t99\t{chrom}\t{start + 1}\t60\t{read_len}M\t=\t{start + frag - read_len + 1}\t{frag}\t{r1}\t{q}"))
        records.append((start + frag - read_len, f"s_r{i}\t147\t{chrom}\t{start + frag - read_len + 1}\t60\t{read_len}M\t=\t{start + 1}\t{-frag}\t{r2}\t{q}"))
    records.sort(key=lambda t: t[0])
    with open(sam, "w") as f:
        f.write(f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:{L}\n@RG\tID:rg\tSM:sample1\n")
        for _, l in records:
            f.write(l + "\n")

    out = genotype_hla(fasta, panel, [sam], f"{chrom}:1-{L}", str(tmp_path / "out"))
    txt = gzip.open(out, "rt").read()
    body = [l for l in txt.splitlines() if not l.startswith("#")]
    assert body, "no HLA record emitted"
    rec = body[0].split("\t")
    assert "HLA_ALLELES=A1,A2" in rec[7]
    gt = rec[9].split(":")[0]
    assert gt in ("0/1", "1/0"), rec  # heterozygous A1/A2
