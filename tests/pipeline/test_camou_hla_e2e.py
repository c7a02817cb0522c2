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


def test_camou_two_intervals_ploidy4(tmp_path):
    """Two BED intervals -> camou ploidy 4 (genotype_camou.cpp ploidy =
    2 x intervals): both intervals produce a VCF, and the PL renormalization
    uses the ploidy-4 coverage scaling."""
    import os

    from graphtyper_tpu.pipeline.genotype_camou import genotype_camou

    cfg = SimConfig(region_length=9000, coverage=22.0, seed=23, snp_rate=1 / 700.0, indel_rate=0.0)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    bed = str(tmp_path / "intervals.bed")
    with open(bed, "w") as f:
        f.write(f"{cfg.chrom}\t1000\t4000\n{cfg.chrom}\t5000\t8000\n")
    genotype_camou(sim.fasta, bed, sim.sams, str(tmp_path / "out"))
    outs = sorted(
        os.path.join(tmp_path, "out", cfg.chrom, f)
        for f in os.listdir(tmp_path / "out" / cfg.chrom)
        if f.endswith(".camou.vcf.gz")
    )
    assert len(outs) == 2, outs
    for out in outs:
        body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
        assert body, f"no records in {out}"
        # ploidy > 2 drops the FILTER column (vcf.cpp:860)
        assert all(l.split("\t")[6] == "." for l in body), out


def test_update_camou_phred_ploidy4():
    """variant.cpp:167-230 update_camou_phred at ploidy 4: hand-computed PL
    triangle for a biallelic site."""
    from graphtyper_tpu.pipeline.genotype_camou import update_camou_phred_all
    from graphtyper_tpu.typer.sample_call import SampleCall
    from graphtyper_tpu.typer.variant import Variant

    v = Variant(abs_pos=10, seqs=[b"A", b"G"])
    # cov = (12 ref, 3 alt): norm_alt = 3*4//2 = 6; phred00 = 6*4 = 24,
    # phred01 = cov0 = 12 -> m = 12; phred00 = (24-12)*3 = 36, phred01 = 0
    v.calls.append(SampleCall(phred=np.zeros(3, dtype=np.int64), coverage=np.array([12, 3])))
    # cov = (0, 0): all-zero PL
    v.calls.append(SampleCall(phred=np.zeros(3, dtype=np.int64), coverage=np.array([0, 0])))
    # cov = (2, 20): norm_alt = 40; phred00 = 160, phred01 = 2 -> m = 2;
    # phred00 = min(99, 158*3) = 99, phred01 = 0
    v.calls.append(SampleCall(phred=np.zeros(3, dtype=np.int64), coverage=np.array([2, 20])))
    update_camou_phred_all([v], ploidy=4)
    np.testing.assert_array_equal(v.calls[0].phred, [36, 0, 0])
    np.testing.assert_array_equal(v.calls[1].phred, [0, 0, 0])
    np.testing.assert_array_equal(v.calls[2].phred, [99, 0, 0])


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
    # segment-calling <...> records: "." FILTER and depth-free FORMAT
    # (vcf.cpp:860, :1027-1036)
    assert rec[6] == "."
    assert rec[8] == "GT:GQ:PL", rec
    gt = rec[9].split(":")[0]
    assert gt in ("0/1", "1/0"), rec  # heterozygous A1/A2


def test_bamshrink_multi(tmp_path):
    """Multi-interval slice writes one BAM covering both intervals without
    duplicating reads (bamshrink.cpp bamshrink_multi)."""
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.pipeline.bamshrink import bamshrink_multi

    cfg = SimConfig(region_length=9000, coverage=12.0, seed=77)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    out = str(tmp_path / "multi.bam")
    bamshrink_multi(sim.sams[0], [(cfg.chrom, 1000, 3000), (cfg.chrom, 6000, 8000)], out)
    h, reads = read_alignments(out)
    assert len(reads) > 50
    names = [r.name for r in reads]
    # reads sorted and unique per mate slot
    assert all(reads[i].pos <= reads[i + 1].pos for i in range(len(reads) - 1))
    from collections import Counter

    worst = Counter((r.name, r.flag & 0x40) for r in reads).most_common(1)[0][1]
    assert worst == 1, "a read was emitted twice across intervals"
    # no kept read maps into the uncovered middle gap (pads are +-900)
    assert not any(4000 < r.pos < 5000 for r in reads)


def test_segment_calling(tmp_path):
    """Whole-panel segment calling: a sample carrying panel alleles A1/A2
    genotypes as 0/1 on the <S> record (segment_calling.cpp semantics)."""
    import numpy as np

    from graphtyper_tpu.graph.build import construct_graph
    from graphtyper_tpu.graph.coords import GenomicRegion
    from graphtyper_tpu.index.build import index_graph
    from graphtyper_tpu.pipeline.caller import call_pool
    from graphtyper_tpu.typer.segment_calling import segment_calling
    from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta

    rng = np.random.default_rng(101)
    L = 4000
    chrom = "chrH"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    p1, p2 = 1500, 1600
    ref1, ref2 = chr(seq[p1]), chr(seq[p2])
    alt1 = "ACGT"[("ACGT".index(ref1) + 1) % 4]
    alt2 = "ACGT"[("ACGT".index(ref2) + 1) % 4]
    vcf = str(tmp_path / "p.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chrH>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"{chrom}\t{p1 + 1}\t.\t{ref1}\t{alt1}\t.\t.\t.\n")
        f.write(f"{chrom}\t{p2 + 1}\t.\t{ref2}\t{alt2}\t.\t.\t.\n")

    hapA1 = seq.copy()
    hapA2 = seq.copy()
    hapA2[p1] = ord(alt1)
    hapA2[p2] = ord(alt2)

    # panel FASTA: per allele an intron (0), a long exon (1) spanning both
    # SNPs, and a trailing intron (2)
    panel = str(tmp_path / "gene.fa")
    with open(panel, "w") as f:
        for name, hap in (("A1", hapA1), ("A2", hapA2)):
            f.write(f">{name}.0\n" + hap[1100:1300].tobytes().decode() + "\n")
            f.write(f">{name}.1\n" + hap[1400:1700].tobytes().decode() + "\n")
            f.write(f">{name}.2\n" + hap[1800:2000].tobytes().decode() + "\n")

    sam = str(tmp_path / "s.sam")
    records = []
    read_len, frag = 125, 320
    for i in range(500):
        hap = [hapA1, hapA2][i % 2]
        start = int(rng.integers(0, L - frag))
        r1 = hap[start : start + read_len].tobytes().decode()
        r2 = hap[start + frag - read_len : start + frag].tobytes().decode()
        q = "I" * read_len
        records.append((start, f"r{i}\t99\t{chrom}\t{start + 1}\t60\t{read_len}M\t=\t{start + frag - read_len + 1}\t{frag}\t{r1}\t{q}"))
        records.append((start + frag - read_len, f"r{i}\t147\t{chrom}\t{start + frag - read_len + 1}\t60\t{read_len}M\t=\t{start + 1}\t{-frag}\t{r2}\t{q}"))
    records.sort(key=lambda t: t[0])
    with open(sam, "w") as f:
        f.write(f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:{L}\n@RG\tID:rg\tSM:s1\n")
        for _, l in records:
            f.write(l + "\n")

    graph = construct_graph(fasta, vcf, f"{chrom}:1-{L}", use_index=True)
    index = index_graph(graph)
    res = call_pool(graph, index, [sam], region=GenomicRegion.parse(f"{chrom}:1-{L}"), is_writing_hap=False)

    out = str(tmp_path / "seg.vcf.gz")
    segment_calling(graph, index, res.scorer, [panel], out, res.vcf.sample_names)
    txt = gzip.open(out, "rt").read()
    body = [l for l in txt.splitlines() if not l.startswith("#")]
    assert body, "no segment record"
    rec = body[0].split("\t")
    assert rec[6] == "."  # segment calling drops the FILTER column (vcf.cpp:860)
    assert "SEGMENT_ALLELES=" in rec[7]
    names = rec[7].split("SEGMENT_ALLELES=")[1].split(";")[0].split(",")
    gt = rec[9].split(":")[0]
    a, b = sorted(int(x) for x in gt.replace("|", "/").split("/"))
    assert {names[a], names[b]} == {"A1", "A2"}, (gt, names)


def test_camou_three_intervals_ploidy6(tmp_path):
    """Three BED intervals -> camou ploidy 6 (VERDICT r4 #7 ploidy>4): all
    three intervals genotype, FILTER stays '.', and hom-ref PLs follow the
    ploidy-6 coverage renormalization."""
    import os

    from graphtyper_tpu.pipeline.genotype_camou import genotype_camou

    cfg = SimConfig(region_length=12000, coverage=22.0, seed=29, snp_rate=1 / 700.0, indel_rate=0.0)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    bed = str(tmp_path / "intervals.bed")
    with open(bed, "w") as f:
        f.write(f"{cfg.chrom}\t500\t3500\n{cfg.chrom}\t4500\t7500\n{cfg.chrom}\t8500\t11500\n")
    genotype_camou(sim.fasta, bed, sim.sams, str(tmp_path / "out"))
    outs = sorted(
        os.path.join(tmp_path, "out", cfg.chrom, f)
        for f in os.listdir(tmp_path / "out" / cfg.chrom)
        if f.endswith(".camou.vcf.gz")
    )
    assert len(outs) == 3, outs
    for out in outs:
        body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
        assert body, f"no records in {out}"
        assert all(l.split("\t")[6] == "." for l in body), out


def test_update_camou_phred_high_ploidy():
    """variant.cpp:167-230 renormalization at ploidy 6 and 8: hand-computed
    PL triangles (norm_alt = cov_alt * ploidy / 2 scales the hom-ref
    penalty with copy number)."""
    from graphtyper_tpu.pipeline.genotype_camou import update_camou_phred_all
    from graphtyper_tpu.typer.sample_call import SampleCall
    from graphtyper_tpu.typer.variant import Variant

    # ploidy 6, cov=(12,3): norm_alt=9, phred00=36, phred01=12 -> m=12,
    # phred00=(36-12)*3=72, phred01=0
    v6 = Variant(abs_pos=10, seqs=[b"A", b"G"])
    v6.calls.append(SampleCall(phred=np.zeros(3, dtype=np.int64), coverage=np.array([12, 3])))
    update_camou_phred_all([v6], ploidy=6)
    np.testing.assert_array_equal(v6.calls[0].phred, [72, 0, 0])

    # ploidy 8: cov=(12,3): norm_alt=12, phred00=48, phred01=12 -> m=12,
    # phred00=min(99,36*3)=99; cov=(20,1): norm_alt=4, phred00=16,
    # phred01=20 -> m=16, phred00=0, phred01=12
    v8 = Variant(abs_pos=10, seqs=[b"A", b"G"])
    v8.calls.append(SampleCall(phred=np.zeros(3, dtype=np.int64), coverage=np.array([12, 3])))
    v8.calls.append(SampleCall(phred=np.zeros(3, dtype=np.int64), coverage=np.array([20, 1])))
    update_camou_phred_all([v8], ploidy=8)
    np.testing.assert_array_equal(v8.calls[0].phred, [99, 0, 0])
    np.testing.assert_array_equal(v8.calls[1].phred, [0, 12, 12])
