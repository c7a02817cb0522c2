"""End-to-end pipeline test: simulate a diploid sample's paired reads from
graph haplotypes, run the single-iteration `genotype --vcf` pipeline, and
check the output VCF calls."""

import gzip

import numpy as np
import pytest

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf


def simulate_sam(path, chrom, contig_len, haplotypes, n_pairs, read_len=63, seed=1, sample="sample1"):
    """Write a SAM with proper read pairs sampled alternately from two
    haplotype sequences."""
    rng = np.random.default_rng(seed)
    lines = [
        "@HD\tVN:1.6\tSO:coordinate",
        f"@SQ\tSN:{chrom}\tLN:{contig_len}",
        f"@RG\tID:rg1\tSM:{sample}",
    ]
    records = []
    for i in range(n_pairs):
        hap = haplotypes[i % len(haplotypes)]
        max_start = len(hap) - read_len
        s1 = int(rng.integers(0, max(1, max_start + 1)))
        s2 = int(rng.integers(0, max(1, max_start + 1)))
        if s1 > s2:
            s1, s2 = s2, s1
        r1 = hap[s1 : s1 + read_len].decode()
        r2 = hap[s2 : s2 + read_len].decode()
        tlen = s2 + read_len - s1
        qual = "I" * read_len
        name = f"sim{i}"
        # first in pair, forward; mate reversed
        records.append((s1, f"{name}\t99\t{chrom}\t{s1 + 1}\t60\t{read_len}M\t=\t{s2 + 1}\t{tlen}\t{r1}\t{qual}"))
        # second in pair, reverse strand (SEQ stored ref-forward)
        records.append((s2, f"{name}\t147\t{chrom}\t{s2 + 1}\t60\t{read_len}M\t=\t{s1 + 1}\t{-tlen}\t{r2}\t{qual}"))
    records.sort(key=lambda t: t[0])
    lines += [r[1] for r in records]
    path.write_text("\n".join(lines) + "\n")


@pytest.fixture()
def chr1_setup(data_dir, tmp_path):
    fa = str(data_dir / "index_test.fa")
    vcf = str(data_dir / "index_test.vcf.gz")
    g = construct_graph(fa, vcf, "chr1")
    return fa, vcf, g, tmp_path


def _read_vcf_gz(path):
    with gzip.open(path, "rt") as f:
        lines = f.read().strip().split("\n")
    header = [l for l in lines if l.startswith("#")]
    body = [l for l in lines if not l.startswith("#")]
    return header, body


def test_het_sample_end_to_end(chr1_setup):
    fa, vcf, g, tmp_path = chr1_setup
    ref = g.get_all_ref()
    alt = ref[:36] + b"G" + ref[37:]
    sam = tmp_path / "sample1.sam"
    simulate_sam(sam, "chr1", 66, [ref, alt], n_pairs=30)

    out = genotype_only_with_a_vcf(fa, [str(sam)], vcf, "chr1", str(tmp_path / "out"))
    header, body = _read_vcf_gz(out)
    assert any(l.startswith("##fileformat=VCFv4.2") for l in header)
    assert header[-1].startswith("#CHROM") and header[-1].endswith("sample1")
    assert len(body) == 1
    fields = body[0].split("\t")
    assert fields[0] == "chr1"
    assert fields[1] == "37"
    assert fields[3] == "C" and fields[4] == "G"
    assert fields[8].startswith("GT:AD:MD:DP")
    call = fields[9].split(":")
    assert call[0] == "0/1"
    ad = [int(x) for x in call[1].split(",")]
    assert ad[0] > 10 and ad[1] > 10
    # INFO sanity
    info = dict(kv.split("=", 1) if "=" in kv else (kv, "") for kv in fields[7].split(";"))
    assert info["AC"] == "1"
    assert info["AN"] == "2"
    assert info["VarType"] == "SG"
    assert fields[6] == "PASS"


def test_homref_sample_no_output(chr1_setup):
    """A pure hom-ref sample has no alt support, so every alt is 'bad' and
    the record is removed by the merge step (vcf_operations.cpp:648-661)."""
    fa, vcf, g, tmp_path = chr1_setup
    ref = g.get_all_ref()
    sam = tmp_path / "s.sam"
    simulate_sam(sam, "chr1", 66, [ref], n_pairs=20)
    out = genotype_only_with_a_vcf(fa, [str(sam)], vcf, "chr1", str(tmp_path / "out"))
    _, body = _read_vcf_gz(out)
    assert body == []


def test_homalt_multiallelic(data_dir, tmp_path):
    """chr3 has a multiallelic site (A -> G,GA); a hom-GA sample should call 2/2."""
    fa = str(data_dir / "index_test.fa")
    vcf = str(data_dir / "index_test.vcf.gz")
    g = construct_graph(fa, vcf, "chr3")
    ref = g.get_all_ref()
    hap = ref[:30] + b"GA" + ref[31:]
    sam = tmp_path / "s.sam"
    simulate_sam(sam, "chr3", 66, [hap], n_pairs=25)
    out = genotype_only_with_a_vcf(fa, [str(sam)], vcf, "chr3", str(tmp_path / "out"))
    _, body = _read_vcf_gz(out)
    assert len(body) >= 1
    # after breakdown the GA insertion becomes an indel record
    found_ins = False
    for line in body:
        f = line.split("\t")
        if len(f[4]) > len(f[3]):
            found_ins = True
            assert f[9].split(":")[0] == "1/1"
    assert found_ins


def test_low_base_quality_penalty(chr1_setup):
    """Low base quality reduces per-read evidence weight (epsilon - 2,
    haplotype.cpp:470-475 via qual2, vcf_writer.cpp:562-563)."""
    fa, vcf, g, tmp_path = chr1_setup
    ref = g.get_all_ref()
    alt = ref[:36] + b"G" + ref[37:]

    def run(qual_char, name):
        import numpy as np

        rng = np.random.default_rng(1)
        lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:chr1\tLN:66", "@RG\tID:rg1\tSM:s1"]
        recs = []
        for i in range(3):
            hap = [ref, alt][i % 2]
            s1, s2 = sorted(rng.integers(0, 4, size=2).tolist())
            L = 63
            recs.append((s1, f"r{i}\t99\tchr1\t{s1+1}\t60\t{L}M\t=\t{s2+1}\t{s2+L-s1}\t{hap[s1:s1+L].decode()}\t{qual_char*L}"))
            recs.append((s2, f"r{i}\t147\tchr1\t{s2+1}\t60\t{L}M\t=\t{s1+1}\t{-(s2+L-s1)}\t{hap[s2:s2+L].decode()}\t{qual_char*L}"))
        recs.sort()
        sam = tmp_path / f"{name}.sam"
        sam.write_text("\n".join(lines + [r[1] for r in recs]) + "\n")
        out = genotype_only_with_a_vcf(fa, [str(sam)], vcf, "chr1:1-66", str(tmp_path / f"out_{name}"))
        _, body = _read_vcf_gz(out)
        return [int(x) for x in body[0].split("\t")[9].split(":")[-1].split(",")]

    pl_hq = run("I", "hq")   # phred 40
    pl_lq = run(",", "lq")   # phred 11 < 25 -> low-qual penalty
    assert pl_hq[1] == 0 and pl_lq[1] == 0  # both still het
    assert pl_lq[0] < pl_hq[0] and pl_lq[2] < pl_hq[2]  # weaker evidence


def test_genotype_with_bamshrink(tmp_path):
    """The default pipeline runs bamshrink first (genotype.cpp:48-121): the
    shrunk temp BAMs must still genotype concordantly with the truth."""
    import gzip

    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=6000, coverage=20.0, seed=61)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    out = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-6000", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    pos2rec = {(int(l.split("\t")[1]), l.split("\t")[3], l.split("\t")[4]): l.split("\t") for l in body}
    ok = tot = 0
    for (pos, ref, alt), gts in sim.truth.items():
        key = (pos + 1, ref.decode(), alt.decode())
        if key in pos2rec:
            called = pos2rec[key][9].split(":")[0]
            tot += 1
            ok += called == f"{gts[0][0]}/{gts[0][1]}"
    assert tot >= 5 and ok / tot > 0.9, (ok, tot)


def test_genotype_primer_masking_runs(tmp_path):
    """--primer_bedpe flows into call_pool (primers.cpp hook): the pipeline
    completes with primers active and emits records."""
    import gzip

    from graphtyper_tpu.config import current_options, replace, set_options
    from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=5000, coverage=16.0, seed=71)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    bedpe = str(tmp_path / "p.bedpe")
    with open(bedpe, "w") as f:
        f.write(f"{cfg.chrom}\t1000\t1030\t{cfg.chrom}\t1400\t1430\n")
    old = current_options()
    try:
        set_options(replace(old, primer_bedpe=bedpe))
        out = genotype_only_with_a_vcf(
            sim.fasta, sim.sams, sim.vcf, f"{cfg.chrom}:1-5000", str(tmp_path / "out")
        )
    finally:
        set_options(old)
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    assert body


def test_multi_contig_region_file(tmp_path):
    """Two contigs genotyped via a region file; outputs land in per-contig
    trees and concatenate cleanly (vcf_concatenate)."""
    import gzip

    import numpy as np

    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.pipeline.vcf_operations import vcf_concatenate
    from graphtyper_tpu.utils.simulate import BASES, SimConfig, simulate_cohort

    rng = np.random.default_rng(67)
    # build a 2-contig FASTA by hand + per-contig reads
    seqs = {f"c{i}": BASES[rng.integers(0, 4, size=6000)] for i in (1, 2)}
    fasta = str(tmp_path / "ref.fa")
    with open(fasta, "w") as f:
        for name, seq in seqs.items():
            f.write(f">{name}\n")
            raw = seq.tobytes().decode()
            for j in range(0, len(raw), 70):
                f.write(raw[j : j + 70] + "\n")
    with open(fasta + ".fai", "w") as f:
        off = 0
        for name, seq in seqs.items():
            off += len(name) + 2
            f.write(f"{name}\t{len(seq)}\t{off}\t70\t71\n")
            off += len(seq) + (len(seq) + 69) // 70

    sams = []
    for name, seq in seqs.items():
        # simple het SNP per contig
        p = 3000
        alt = BASES[(int(np.searchsorted(BASES, seq[p])) + 1) % 4]
        hap2 = seq.copy()
        hap2[p] = alt
        lines = [f"@HD\tVN:1.6\tSO:coordinate", f"@SQ\tSN:c1\tLN:6000", f"@SQ\tSN:c2\tLN:6000",
                 f"@RG\tID:rg_{name}\tSM:sample_{name}"]
        recs = []
        for i in range(700):
            hap = [seq, hap2][i % 2]
            start = int(rng.integers(0, 6000 - 320))
            r1 = hap[start : start + 125].tobytes().decode()
            r2 = hap[start + 195 : start + 320].tobytes().decode()
            q = "I" * 125
            recs.append((start, f"{name}_r{i}\t99\t{name}\t{start + 1}\t60\t125M\t=\t{start + 196}\t320\t{r1}\t{q}"))
            recs.append((start + 195, f"{name}_r{i}\t147\t{name}\t{start + 196}\t60\t125M\t=\t{start + 1}\t-320\t{r2}\t{q}"))
        recs.sort(key=lambda t: t[0])
        sam = str(tmp_path / f"{name}.sam")
        with open(sam, "w") as f:
            f.write("\n".join(lines + [r[1] for r in recs]) + "\n")
        sams.append(sam)

    outs = []
    for region in ("c1:1-6000", "c2:1-6000"):
        out = genotype(fasta, sams, region, str(tmp_path / "out"))
        body_r = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
        assert body_r, f"no records for {region}"
        outs.append(out)
    concat = str(tmp_path / "all.vcf.gz")
    vcf_concatenate(outs, concat)
    body = [l for l in gzip.open(concat, "rt").read().splitlines() if not l.startswith("#")]
    chroms = {l.split("\t")[0] for l in body}
    assert chroms == {"c1", "c2"}, body


def test_cohort_size_tuning():
    """genotype.cpp:693-732: cohorts >=4 samples raise the extraction support
    thresholds; >=1500 samples raise the extract score further."""
    from graphtyper_tpu.config import current_options, set_options
    from graphtyper_tpu.pipeline.genotype import apply_cohort_size_tuning

    old = current_options()
    try:
        apply_cohort_size_tuning(3)
        o = current_options()
        assert o.genotype_aln_min_support == 4
        assert o.minimum_extract_score_over_homref == 27

        apply_cohort_size_tuning(4)
        o = current_options()
        assert o.genotype_aln_min_support == 5
        assert o.genotype_dis_min_support == 9
        assert abs(o.genotype_aln_min_support_ratio - 0.23) < 1e-9
        assert o.minimum_extract_score_over_homref == 33

        set_options(old)
        apply_cohort_size_tuning(1500)
        o = current_options()
        assert o.minimum_extract_score_over_homref == 36
    finally:
        set_options(old)


def test_malformed_inputs(tmp_path):
    """Reference error semantics: truncated BAM raises cleanly; non-ACGT alt
    records are skipped with a warning (constructor.cpp:1500-1512); an SV
    alt in a non-SV graph is a hard error (constructor.cpp:1245-1255)."""
    import pytest

    from graphtyper_tpu.graph.build import construct_graph
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=5000, coverage=10.0, seed=3, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)

    raw = open(sim.sams[0], "rb").read()
    trunc = str(tmp_path / "trunc.bam")
    open(trunc, "wb").write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        genotype(sim.fasta, [trunc], f"{cfg.chrom}:1-5000", str(tmp_path / "o1"))

    vcf = str(tmp_path / "bad.vcf")
    open(vcf, "w").write(
        "##fileformat=VCFv4.2\n##contig=<ID=%s>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "%s\t200\t.\tC\tN\t.\t.\t.\n%s\t300\t.\tG\tT\t.\t.\t.\n"
        % (cfg.chrom, cfg.chrom, cfg.chrom)
    )
    g = construct_graph(sim.fasta, vcf, f"{cfg.chrom}:1-5000")
    sites = list(g.genotypes())
    assert len(sites) == 1  # the N alt was dropped, the SNP kept

    sv_vcf = str(tmp_path / "sv_in_small.vcf")
    open(sv_vcf, "w").write(
        "##fileformat=VCFv4.2\n##contig=<ID=%s>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "%s\t100\t.\tA\t<DEL>\t.\t.\tSVTYPE=DEL;SVLEN=-100;END=200\n" % (cfg.chrom, cfg.chrom)
    )
    with pytest.raises(ValueError):
        construct_graph(sim.fasta, sv_vcf, f"{cfg.chrom}:1-5000")


def test_differential_paths_identical(tmp_path):
    """All implementation paths (device vs host scoring, native vs Python
    caller/aligner) produce the byte-identical VCF on an indel-bearing
    random cohort."""
    import gzip

    from graphtyper_tpu.config import current_options, replace, set_options

    def body(p):
        return [l for l in gzip.open(p, "rt").read().splitlines() if not l.startswith("#")]

    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(
        region_length=20_000, coverage=18.0, n_samples=2, seed=101,
        out_format="bam", indel_rate=0.002, error_rate=0.005,
    )
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    old = current_options()
    outs = {}
    try:
        for label, opts in (
            ("default", old),
            ("host_scoring", replace(old, device_scoring="off")),
            ("python_caller", replace(old, native_caller="off")),
            ("python_aligner", replace(old, native_caller="off", native_aligner="off")),
        ):
            set_options(opts)
            o = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-20000", str(tmp_path / label))
            outs[label] = body(o)
    finally:
        set_options(old)
    base = outs["default"]
    assert len(base) > 5
    for k, v in outs.items():
        assert v == base, k

    # hq_reads must gate identically in the native and Python paths (a
    # regression: the Python scorer once ignored opts.hq_reads entirely)
    hq_outs = {}
    try:
        for label, opts in (
            ("hq", replace(old, hq_reads=True)),
            ("hq_host", replace(old, hq_reads=True, device_scoring="off", native_caller="off")),
        ):
            set_options(opts)
            o = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-20000", str(tmp_path / label))
            hq_outs[label] = body(o)
    finally:
        set_options(old)
    assert hq_outs["hq"] == hq_outs["hq_host"]


def test_csi_index_copied_to_output(tmp_path):
    """--is_csi runs must place the .csi next to the final region VCF (a
    regression: the final copy step only carried .tbi)."""
    import os

    from graphtyper_tpu.config import current_options, replace, set_options
    from graphtyper_tpu.io.tabix import CsiIndex, load_index
    from graphtyper_tpu.pipeline.genotype import genotype
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=8000, coverage=14.0, seed=5, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    old = current_options()
    set_options(replace(old, is_csi=True))
    try:
        out = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-8000", str(tmp_path / "csi"))
    finally:
        set_options(old)
    assert os.path.exists(out + ".csi")
    assert isinstance(load_index(out + ".csi"), CsiIndex)
