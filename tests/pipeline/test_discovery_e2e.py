"""Full discovery + iterative-regenotyping pipeline test: a sample with a
het SNP and a het 4bp deletion must be discovered from CIGAR pileups,
realigned, graph-genotyped across iterations, and emitted correctly."""

import gzip

import numpy as np
import pytest


@pytest.fixture()
def scenario(tmp_path):
    rng = np.random.default_rng(5)
    ref = "".join(rng.choice(list("ACGT"), 300))
    fa = tmp_path / "disc.fa"
    with open(fa, "w") as f:
        f.write(">chrD\n")
        for i in range(0, 300, 70):
            f.write(ref[i : i + 70] + "\n")
    snp_hap = ref[:100] + ("A" if ref[100] != "A" else "C") + ref[101:]
    del_hap = ref[:200] + ref[204:]

    def cigar_and_pos(hap, s, L):
        if hap is del_hap and s < 200 and s + L > 200:
            m1 = 200 - s
            return f"{m1}M4D{L-m1}M", s
        return f"{L}M", (s if (hap is not del_hap or s + L <= 200) else s + 4)

    sam = tmp_path / "s1.sam"
    L = 100
    lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:chrD\tLN:300", "@RG\tID:rg\tSM:s1"]
    recs = []
    haps = [ref, snp_hap, del_hap]
    for i in range(40):
        hap = haps[i % len(haps)]
        s1 = int(rng.integers(0, len(hap) - L))
        s2 = int(rng.integers(0, len(hap) - L))
        if s1 > s2:
            s1, s2 = s2, s1
        c1, p1 = cigar_and_pos(hap, s1, L)
        c2, p2 = cigar_and_pos(hap, s2, L)
        t = p2 + L - p1
        recs.append((p1, f"pr{i}\t99\tchrD\t{p1+1}\t60\t{c1}\t=\t{p2+1}\t{t}\t{hap[s1:s1+L]}\t{'I'*L}"))
        recs.append((p2, f"pr{i}\t147\tchrD\t{p2+1}\t60\t{c2}\t=\t{p1+1}\t{-t}\t{hap[s2:s2+L]}\t{'I'*L}"))
    recs.sort()
    sam.write_text("\n".join(lines + [r[1] for r in recs]) + "\n")
    return str(fa), str(sam), ref, tmp_path


def test_discovery_finds_snp_and_deletion(scenario):
    from graphtyper_tpu.typer.discovery import streamlined_discovery

    fa, sam, ref, tmp_path = scenario
    names: list = []
    vcf = streamlined_discovery([sam], fa, "chrD", names)
    assert names == ["s1"]
    kinds = {(v.abs_pos, v.type) for v in vcf.variants}
    assert (101, "X") in kinds
    assert (200, "D") in kinds


def test_full_genotype_pipeline(scenario):
    from graphtyper_tpu.pipeline.genotype import genotype

    fa, sam, ref, tmp_path = scenario
    out = genotype(fa, [sam], "chrD", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().split("\n") if l and not l.startswith("#")]
    by_pos = {l.split("\t")[1]: l.split("\t") for l in body}
    assert "101" in by_pos
    snp = by_pos["101"]
    assert (snp[3], snp[4]) == ("T", "A")
    assert snp[9].split(":")[0] == "0/1"
    assert snp[6] == "PASS"
    assert "200" in by_pos
    dele = by_pos["200"]
    assert len(dele[3]) == 5 and len(dele[4]) == 1  # 4bp deletion kept whole
    assert dele[9].split(":")[0] == "0/1"
    # input_sites copy exists
    assert (tmp_path / "out" / "input_sites" / "chrD").exists()
