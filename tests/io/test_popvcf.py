"""popVCF encoder/decoder roundtrip tests."""

from graphtyper_tpu.io.popvcf import decode_lines, encode_lines


HEADER = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"


def test_roundtrip_identical_fields():
    site = "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:PL"
    line1 = site + "\t0/0:0,30,50\t0/0:0,30,50\t0/1:40,0,60\t0/0:0,30,50"
    line2 = "chr1\t150\t.\tC\tT\t50\tPASS\t.\tGT:PL" + "\t0/0:0,30,50\t0/0:0,30,50\t0/1:40,0,60\t1/1:90,30,0"
    enc = encode_lines([HEADER, line1, line2])
    assert enc[0] == HEADER
    # line1: first 0/0 raw, repeats become uids
    f1 = enc[1].split("\t")
    assert f1[9] == "0/0:0,30,50"
    assert f1[10] == ":"  # uid 0
    assert f1[12] == ":"
    # line2: same-as-above become '$'/'&'
    f2 = enc[2].split("\t")
    assert f2[9] == "$"
    assert f2[10] == "&"
    dec = decode_lines(enc)
    assert dec == [HEADER, line1, line2]


def test_roundtrip_window_reset():
    l1 = "chr1\t100\t.\tA\tG\t.\t.\t.\tGT\t0/0\t0/0"
    l2 = "chr1\t20100\t.\tA\tG\t.\t.\t.\tGT\t0/0\t0/0"  # different 10kb window
    enc = encode_lines([l1, l2])
    f2 = enc[1].split("\t")
    assert f2[9] == "0/0"  # no prev-line reference across windows
    assert decode_lines(enc) == [l1, l2]


def test_roundtrip_multisample_random():
    import numpy as np

    rng = np.random.default_rng(0)
    gts = ["0/0:0,20,40", "0/1:20,0,20", "1/1:40,20,0"]
    lines = []
    for i in range(20):
        fields = [f"chr2\t{1000+i}\t.\tA\tC\t9\tPASS\t.\tGT:PL"]
        fields += [gts[rng.integers(0, 3)] for _ in range(30)]
        lines.append("\t".join(fields))
    enc = encode_lines(lines)
    assert decode_lines(enc) == lines
    assert sum(len(l) for l in enc) < sum(len(l) for l in lines)  # actually compresses


def test_genotype_with_popvcf_encoding(tmp_path):
    """--encoding=popvcf: the final VCF is popVCF-encoded in place (lossless
    on decode) and carries a rebuilt index."""
    import gzip
    import os

    from graphtyper_tpu.config import current_options, replace, set_options
    from graphtyper_tpu.io.popvcf import decode_lines
    from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=6000, coverage=14.0, seed=47, n_samples=3)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    old = current_options()
    try:
        set_options(replace(old, encoding="v"))
        out_v = genotype_only_with_a_vcf(
            sim.fasta, sim.sams, sim.vcf, f"{cfg.chrom}:1-6000", str(tmp_path / "v")
        )
        set_options(replace(old, encoding="p"))
        out_p = genotype_only_with_a_vcf(
            sim.fasta, sim.sams, sim.vcf, f"{cfg.chrom}:1-6000", str(tmp_path / "p")
        )
    finally:
        set_options(old)
    assert os.path.exists(out_p + ".tbi")
    plain = gzip.open(out_v, "rt").read().rstrip("\n").split("\n")
    encoded = gzip.open(out_p, "rt").read().rstrip("\n").split("\n")
    decoded = decode_lines(encoded)
    assert decoded == plain  # lossless
    assert encoded != plain  # actually encoded (repeated fields dedup)
