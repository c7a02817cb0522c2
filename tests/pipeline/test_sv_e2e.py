"""End-to-end SV genotyping test: a heterozygous 150bp deletion simulated
from diploid haplotypes must come back as DEL records (AGGREGATED +
breakpoint/coverage models, sv.cpp reformat semantics) with a 0/1 call for
the carrier sample and 0/0 for the hom-ref sample."""

import gzip

import numpy as np
import pytest

from graphtyper_tpu.pipeline.genotype import genotype_sv
from graphtyper_tpu.utils.simulate import BASES, SimConfig, _random_seq, _write_fasta


def _write_sv_vcf(path, chrom, pos1, ref_base, size, end1):
    lines = [
        "##fileformat=VCFv4.2",
        f"##contig=<ID={chrom}>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        f"{chrom}\t{pos1}\t.\t{ref_base}\t<DEL>\t.\t.\tSVTYPE=DEL;SVLEN=-{size};SVSIZE={size};END={end1}",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _sim_reads(path, chrom, contig_len, haps, n_pairs, sample, seed, read_len=125, frag=320):
    rng = np.random.default_rng(seed)
    records = []
    for i in range(n_pairs):
        hap = haps[i % len(haps)]
        f = min(frag + int(rng.normal(0, 30)), len(hap) - 1)
        f = max(read_len + 10, f)
        start = int(rng.integers(0, len(hap) - f))
        r1 = hap[start : start + read_len]
        r2 = hap[start + f - read_len : start + f]
        qual = "I" * read_len
        name = f"{sample}_r{i}"
        # positions are approximations (mapper-style): deletion carriers map
        # with the reference coordinates of the fragment start
        p1, p2 = start, start + f - read_len
        tlen = p2 + read_len - p1
        records.append((p1, f"{name}\t99\t{chrom}\t{p1 + 1}\t60\t{read_len}M\t=\t{p2 + 1}\t{tlen}\t{r1.tobytes().decode()}\t{qual}"))
        records.append((p2, f"{name}\t147\t{chrom}\t{p2 + 1}\t60\t{read_len}M\t=\t{p1 + 1}\t{-tlen}\t{r2.tobytes().decode()}\t{qual}"))
    records.sort(key=lambda t: t[0])
    with open(path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n")
        f.write(f"@SQ\tSN:{chrom}\tLN:{contig_len}\n")
        f.write(f"@RG\tID:rg_{sample}\tSM:{sample}\n")
        for _, line in records:
            f.write(line + "\n")


def test_het_deletion(tmp_path):
    rng = np.random.default_rng(4)
    L = 8000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    del_start0 = 3000  # 0-based position AFTER which bases are deleted
    size = 150
    sv_vcf = str(tmp_path / "sv.vcf")
    _write_sv_vcf(sv_vcf, chrom, del_start0 + 1, chr(seq[del_start0]), size, del_start0 + 1 + size)

    hap_ref = seq
    hap_del = np.concatenate([seq[: del_start0 + 1], seq[del_start0 + 1 + size :]])
    carrier = str(tmp_path / "carrier.sam")
    homref = str(tmp_path / "homref.sam")
    _sim_reads(carrier, chrom, L, [hap_ref, hap_del], 900, "carrier", 1)
    _sim_reads(homref, chrom, L, [hap_ref, hap_ref], 900, "homref", 2)

    out = genotype_sv(fasta, sv_vcf, [carrier, homref], f"{chrom}:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    assert body, "no SV records emitted"
    del_records = [l for l in body if "SVTYPE=DEL" in l]
    assert del_records, body
    models = {l.split("\t")[7].split("SVMODEL=")[1].split(";")[0] for l in del_records if "SVMODEL=" in l}
    assert "AGGREGATED" in models, models

    # the AGGREGATED record carries the genotype calls
    agg = [l for l in del_records if "SVMODEL=AGGREGATED" in l][0].split("\t")
    gts = [f.split(":")[0] for f in agg[9:11]]
    assert gts[0] in ("0/1", "1/1"), agg  # carrier has the deletion
    assert gts[1] == "0/0", agg  # hom-ref stays hom-ref
    # breakpoint models also reported (sv.cpp combined calls)
    assert any("SVMODEL=BREAKPOINT" in l for l in del_records) or any(
        "SVMODEL=COVERAGE" in l for l in del_records
    )


def test_het_insertion(tmp_path):
    """A 120bp insertion carried heterozygously genotypes as INS 0/1."""
    rng = np.random.default_rng(7)
    L = 8000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    ins_at0 = 3500  # insertion after this 0-based position
    ins_seq = _random_seq(rng, 120).tobytes().decode()
    sv_vcf = str(tmp_path / "sv.vcf")
    with open(sv_vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chrS>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(
            f"{chrom}\t{ins_at0 + 1}\t.\t{chr(seq[ins_at0])}\t<INS>\t.\t.\t"
            f"SVTYPE=INS;SVLEN=120;SVSIZE=120;SEQ={ins_seq}\n"
        )

    hap_ref = seq
    hap_ins = np.concatenate([
        seq[: ins_at0 + 1],
        np.frombuffer(ins_seq.encode(), dtype=np.uint8),
        seq[ins_at0 + 1 :],
    ])
    carrier = str(tmp_path / "carrier.sam")
    _sim_reads(carrier, chrom, L, [hap_ref, hap_ins], 900, "carrier", 3)

    out = genotype_sv(fasta, sv_vcf, [carrier], f"{chrom}:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    ins_records = [l for l in body if "SVTYPE=INS" in l]
    assert ins_records, body
    # at least one INS model (breakpoint or aggregated) calls the carrier
    gts = {l.split("\t")[9].split(":")[0] for l in ins_records}
    assert gts & {"0/1", "1/1"}, ins_records


def test_hom_duplication(tmp_path):
    """A 200bp tandem duplication (DUP with END/SVSIZE) genotypes as DUP with
    alt support for the homozygous carrier."""
    rng = np.random.default_rng(9)
    L = 9000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    dup_start0 = 4000
    dup_len = 200
    sv_vcf = str(tmp_path / "sv.vcf")
    with open(sv_vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chrS>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(
            f"{chrom}\t{dup_start0 + 1}\t.\t{chr(seq[dup_start0])}\t<DUP>\t.\t.\t"
            f"SVTYPE=DUP;SVLEN={dup_len};SVSIZE={dup_len};END={dup_start0 + 1 + dup_len}\n"
        )

    # tandem duplication: the segment repeats
    hap_dup = np.concatenate([
        seq[: dup_start0 + 1 + dup_len],
        seq[dup_start0 + 1 : dup_start0 + 1 + dup_len],
        seq[dup_start0 + 1 + dup_len :],
    ])
    carrier = str(tmp_path / "carrier.sam")
    _sim_reads(carrier, chrom, L, [hap_dup, hap_dup], 1000, "carrier", 5)

    out = genotype_sv(fasta, sv_vcf, [carrier], f"{chrom}:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    dup_records = [l for l in body if "SVTYPE=DUP" in l]
    assert dup_records, body
    gts = {l.split("\t")[9].split(":")[0] for l in dup_records}
    assert gts & {"0/1", "1/1"}, dup_records


def test_het_inversion(tmp_path):
    """A 300bp inversion carried heterozygously genotypes as INV with alt
    support (breakpoint models; sv.cpp INV handling)."""
    rng = np.random.default_rng(21)
    L = 9000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    inv_start0 = 4000
    inv_len = 300
    sv_vcf = str(tmp_path / "sv.vcf")
    with open(sv_vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chrS>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(
            f"{chrom}\t{inv_start0 + 1}\t.\t{chr(seq[inv_start0])}\t<INV>\t.\t.\t"
            f"SVTYPE=INV;SVLEN={inv_len};SVSIZE={inv_len};END={inv_start0 + 1 + inv_len}\n"
        )

    # inversion: the segment reverse-complements
    comp = np.frombuffer(bytes.maketrans(b"ACGT", b"TGCA"), dtype=np.uint8)
    seg = seq[inv_start0 + 1 : inv_start0 + 1 + inv_len]
    rc = np.frombuffer(seg.tobytes().translate(bytes.maketrans(b"ACGT", b"TGCA")), dtype=np.uint8)[::-1]
    hap_inv = np.concatenate([seq[: inv_start0 + 1], rc, seq[inv_start0 + 1 + inv_len :]])
    carrier = str(tmp_path / "carrier.sam")
    _sim_reads(carrier, chrom, L, [seq, hap_inv], 1000, "carrier", 8)

    out = genotype_sv(fasta, sv_vcf, [carrier], f"{chrom}:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    inv_records = [l for l in body if "SVTYPE=INV" in l]
    assert inv_records, body
    gts = {l.split("\t")[9].split(":")[0] for l in inv_records}
    assert gts & {"0/1", "1/1"}, inv_records


def test_breakend(tmp_path):
    """A BND adjacency (t[chr:pos[ form joining 2000 -> 6001, a deletion-like
    junction) genotypes with alt support for the carrier
    (constructor.cpp:312 add_sv_breakend)."""
    rng = np.random.default_rng(33)
    L = 9000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    bnd_pos0 = 2000  # 0-based; junction after this base
    mate_pos1 = 6001  # 1-based mate position
    ref_base = chr(seq[bnd_pos0])
    sv_vcf = str(tmp_path / "sv.vcf")
    with open(sv_vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chrS>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(
            f"{chrom}\t{bnd_pos0 + 1}\t.\t{ref_base}\t{ref_base}[{chrom}:{mate_pos1}[\t.\t.\t"
            f"SVTYPE=BND\n"
        )

    # the reference's add_sv_breakend passes the parsed 1-based mate pos
    # straight into a 0-based readRegion (constructor.cpp:396-402 via
    # read_reference_seq :241-252), so the junction allele continues from
    # 0-based `mate_pos1`, not mate_pos1-1; we mirror that convention
    hap_bnd = np.concatenate([seq[: bnd_pos0 + 1], seq[mate_pos1:]])
    carrier = str(tmp_path / "carrier.sam")
    _sim_reads(carrier, chrom, L, [seq, hap_bnd], 1000, "carrier", 12)

    out = genotype_sv(fasta, sv_vcf, [carrier], f"{chrom}:1-{L}", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    bnd_records = [l for l in body if "SVTYPE=BND" in l]
    assert bnd_records, body
    gts = {l.split("\t")[9].split(":")[0] for l in bnd_records}
    assert gts & {"0/1", "1/1"}, bnd_records
