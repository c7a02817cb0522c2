"""Formula-level tests of the INFO generation (variant.cpp:483-1096), the
HWE excess-het test (snp_hwe.cpp), variant decomposition
(break_down_variant, variant.cpp:1652-2230), and primer masking
(primers.cpp) — all against hand-computed values."""

import math

import numpy as np
import pytest

from graphtyper_tpu.models.hwe import p_hwe_excess_het
from graphtyper_tpu.models.logistic import get_aa_score, get_logf
from graphtyper_tpu.typer.sample_call import SampleCall
from graphtyper_tpu.typer.variant import Variant, break_down_variant, break_multi_snps


def _call(phred, coverage, amb=0):
    return SampleCall(
        phred=np.array(phred, dtype=np.int64),
        coverage=np.array(coverage, dtype=np.int64),
        ambiguous_depth=amb,
    )


def _cohort_variant():
    """Biallelic A>G with a hom-ref, a het, and a hom-alt sample."""
    var = Variant(abs_pos=1000, seqs=[b"A", b"G"])
    var.calls = [
        _call([0, 30, 60], [10, 0]),  # 0/0, GQ 30 (PASS)
        _call([40, 0, 45], [6, 5]),  # 0/1, GQ 40 (PASS)
        _call([80, 50, 0], [0, 9]),  # 1/1, GQ 50 (PASS)
    ]
    return var


def test_generate_infos_hand_computed():
    var = _cohort_variant()
    good = var.generate_infos()
    infos = var.infos
    assert infos["AC"] == "3"  # 1 (het) + 2 (hom-alt)
    assert infos["AN"] == "6"  # 3 genotyped samples
    assert infos["AF"] == "0.5"
    assert infos["NHomRef"] == "1"
    assert infos["NHet"] == "1"
    assert infos["NHomAlt"] == "1"
    assert infos["PASS_AC"] == "3"
    assert infos["PASS_AN"] == "6"
    assert infos["PASS_ratio"] == "1"
    assert infos["SeqDepth"] == "30"  # 10 + 11 + 9
    # ABHet = alt het depth / total het depth = 5 / (6+5)
    assert abs(float(infos["ABHet"]) - 5 / 11) < 1e-4  # %.4g formatting
    # ABHom = called-allele depth / total hom depth = (10+9)/(10+9+0)
    assert float(infos["ABHom"]) == 1.0
    # QD: only phred[0]>0 calls contribute; het min(25*5,40)=40 over 5,
    # hom-alt min(25*9,80)=80 over 9 -> 120/14
    assert abs(float(infos["QD"]) - 120 / 14) < 1e-3
    assert abs(float(infos["QDalt"]) - 120 / 14) < 1e-3
    assert infos["MaxAAS"] == "9"
    assert abs(float(infos["MaxAASR"]) - 1.0) < 1e-6
    assert infos["VarType"] == "SG"
    # no read-level stats accumulated -> MQ 0, SB absent sentinel
    assert infos["MQ"] == "0"
    assert infos["SB"] == "-1"
    # PexcessHet for (hets=1, hom1=1, hom2=1) = 1.0
    assert float(infos["PexcessHet"]) == 1.0
    assert good == [1]  # QD >= 1, MaxAAS >= 2


def test_hwe_excess_het_exact_values():
    # no heterozygotes at a monomorphic site -> 1.0
    assert p_hwe_excess_het(0, 5, 0) == 1.0
    # 2 samples, both het (alleles 2+2): configs hets in {0,2} with
    # P(2)=2/3 under the exact conditional distribution
    assert abs(p_hwe_excess_het(2, 0, 0) - 2 / 3) < 1e-9
    # more hets than expected is monotonically less likely
    p_low = p_hwe_excess_het(2, 4, 4)
    p_high = p_hwe_excess_het(8, 1, 1)
    assert p_high < p_low <= 1.0
    # symmetric in hom classes
    assert p_hwe_excess_het(3, 7, 2) == p_hwe_excess_het(3, 2, 7)


def test_aa_score_and_logf_wiring():
    """AAScore/LOGF must be fed exactly the features the reference derives
    (variant.cpp:973-1036): abhom, |2(SBalt-0.5)|, mismatches/depth/10,
    round(score_diff/depth), QD, clipped/depth/10, round(sqrt(mq2/depth)),
    with the high-mismatch/clip dampers."""
    var = _cohort_variant()
    st = var.stats
    from graphtyper_tpu.models.genotype_model import VarStats

    sized = VarStats.sized(2)
    st.per_allele = sized.per_allele
    st.read_strand = sized.read_strand
    pa = st.per_allele[1]
    pa.score_diff = 140
    pa.mismatches = 700
    pa.clipped_bp = 420
    pa.mapq_squared = 14 * 60 * 60
    st.read_strand[1].r1_forward = 6
    st.read_strand[1].r1_reverse = 8
    st.mapq_squared = 30 * 60 * 60
    good = var.generate_infos()
    # features: depth d = 14 (5 + 9 alt coverage)
    d = 14.0
    qd = 120 / 14
    abhom = 1.0
    sb = abs(2.0 * ((8 / d) - 0.5))
    mm = 700 / d / 10.0
    sd = round(140 / d)
    cr = 420 / d / 10.0
    mq = round(math.sqrt(14 * 60 * 60 / d))
    expected = get_aa_score(abhom, sb, mm, sd, qd, cr, mq)
    # dampers: mm=5.0 > 1.5 and cr+mm = 8.0 > 2.5
    expected *= max(0.5, 1.0 - ((mm - 1.5) / 20.0))
    expected *= max(0.5, 1.0 - ((cr + mm - 2.5) / 40.0))
    assert abs(float(var.infos["AAScore"]) - expected) < 1e-3
    # LOGF wiring
    info_mq = round(math.sqrt(st.mapq_squared / 30))
    expected_logf = get_logf(
        abhom, 0 / 30, info_mq, 1.0, 3 / 3, qd, int(5 / 11 * 10 + 0.00001), int(6 / 14 * 10 + 0.00001)
    )
    assert abs(float(var.infos["LOGF"]) - expected_logf) < 1e-3


def test_break_multi_snps():
    """Same-length alleles decompose into per-offset SNPs with PL projection
    new_PL[x',y'] = min over old pairs mapping to (x',y') (variant.cpp:1996)."""
    var = Variant(abs_pos=500, seqs=[b"ACA", b"GCA", b"ACT"])
    var.calls = [
        _call([40, 0, 70, 50, 90, 95], [4, 5, 0]),  # 0/1
        _call([30, 40, 70, 0, 90, 95], [5, 0, 4]),  # 0/2 (keeps allele 2 called)
    ]
    out = break_multi_snps(var)
    assert [v.abs_pos for v in out] == [500, 502]
    assert out[0].seqs == [b"A", b"G"]
    assert out[1].seqs == [b"A", b"T"]
    # first SNP: old alleles map 0->0, 1->1, 2->0
    # call1: PL(0,0)=min(PL00,PL02,PL22)=min(40,50,95)=40
    #        PL(0,1)=min(PL01,PL12)=min(0,90)=0 ; PL(1,1)=70
    np.testing.assert_array_equal(out[0].calls[0].phred, [40, 0, 70])
    np.testing.assert_array_equal(out[0].calls[0].coverage, [4, 5])
    # call2: PL(0,0)=min(30,0,95)=0, PL(0,1)=min(40,90)=40, PL(1,1)=70
    np.testing.assert_array_equal(out[0].calls[1].phred, [0, 40, 70])
    np.testing.assert_array_equal(out[0].calls[1].coverage, [9, 0])
    # second SNP: map 0->0, 1->0, 2->1
    # call1: PL(0,0)=min(40,0,70)=0, PL(0,1)=min(50,90)=50, PL(1,1)=95
    np.testing.assert_array_equal(out[1].calls[0].phred, [0, 50, 95])
    np.testing.assert_array_equal(out[1].calls[0].coverage, [9, 0])
    # call2: PL(0,0)=min(30,40,70)=30, PL(0,1)=min(0,90)=0, PL(1,1)=95
    np.testing.assert_array_equal(out[1].calls[1].phred, [30, 0, 95])
    np.testing.assert_array_equal(out[1].calls[1].coverage, [5, 4])


def test_break_down_alignment_indel(tmp_path):
    """Different-length alleles decompose via alignment (break_down_skyr
    semantics): an MNP+indel alt yields separate normalized variants."""
    from graphtyper_tpu.graph.build import construct_graph
    from graphtyper_tpu.utils.simulate import _write_fasta

    seq = b"GGGGACGTACGTTTTTACGTACGTGGGG"
    _write_fasta(str(tmp_path / "r.fa"), "c1", np.frombuffer(seq, dtype=np.uint8))
    graph = construct_graph(str(tmp_path / "r.fa"), "", "c1")
    # ref GACGT -> alt GCGT (deletes A... normalized) + SNP elsewhere
    var = Variant(abs_pos=5, seqs=[b"ACGTACG", b"ACGTACT", b"AGTACG"])
    var.calls = [
        _call([30, 0, 40, 25, 60, 80], [2, 3, 1]),  # 0/1 (the SNP alt)
        _call([30, 40, 70, 0, 90, 95], [5, 0, 4]),  # 0/2 (the deletion alt)
    ]
    out = break_down_variant(var, graph, is_no_variant_overlapping=False, is_all_biallelic=False)
    assert len(out) >= 2
    # the SNP (G>T) and the 1bp deletion both come out as separate variants
    assert any(v.seqs == [b"G", b"T"] for v in out), [v.seqs for v in out]
    assert any(len(v.seqs[0]) != len(v.seqs[1]) for v in out), [v.seqs for v in out]
    for v in out:
        assert len(v.calls) == 2
        assert v.seqs[0] != v.seqs[1]


def test_primer_masking(tmp_path):
    """A forward path starting inside a left primer region loses alt support
    of sites inside the primer (primers.cpp check)."""
    from graphtyper_tpu.graph.build import construct_graph
    from graphtyper_tpu.typer.genotype_paths import GenotypePaths
    from graphtyper_tpu.typer.path import Path
    from graphtyper_tpu.typer.primers import Primers
    from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta

    rng = np.random.default_rng(3)
    seq = _random_seq(rng, 400)
    _write_fasta(str(tmp_path / "r.fa"), "c1", seq)
    ref_b = chr(seq[99])
    alt_b = "ACGT"[("ACGT".index(ref_b) + 1) % 4]
    vcf = str(tmp_path / "v.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=c1>\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"c1\t100\t.\t{ref_b}\t{alt_b}\t.\t.\t.\n")
    graph = construct_graph(str(tmp_path / "r.fa"), vcf, "c1")
    site_order = graph.genotypes()[0].id

    bedpe = str(tmp_path / "p.bedpe")
    with open(bedpe, "w") as f:
        # left primer covers [90, 110) 0-based; right primer far away
        f.write("c1\t90\t110\tc1\t300\t320\n")
    primers = Primers(bedpe, graph)

    # a ref-supporting path starting inside the left primer: the spurious
    # reference support is erased (the primer sequence IS the reference)
    geno = GenotypePaths(flags=0, read_length=50)  # forward read
    p = Path(start=95, end=144, read_start_index=0, read_end_index=49,
             var_order=[site_order], nums=[{0, 1}])
    geno.paths = [p]
    primers.check(geno)
    assert p.var_order == [], "ref support inside the primer must be erased"

    # alt-only support survives (the read disagrees with the primer seq)
    geno1 = GenotypePaths(flags=0, read_length=50)
    p1 = Path(start=95, end=144, read_start_index=0, read_end_index=49,
              var_order=[site_order], nums=[{1}])
    geno1.paths = [p1]
    primers.check(geno1)
    assert p1.nums[0] == {1}

    # a path starting outside the primer keeps its support
    geno2 = GenotypePaths(flags=0, read_length=50)
    p2 = Path(start=130, end=179, read_start_index=0, read_end_index=49,
              var_order=[site_order], nums=[{0, 1}])
    geno2.paths = [p2]
    primers.check(geno2)
    assert p2.nums[0] == {0, 1}


def test_generate_infos_fuzz():
    """Randomized cohorts: INFO fields must match an independent brute-force
    recomputation from the calls (round-1 priority: INFO parity fuzzing)."""
    rng = np.random.default_rng(12345)
    for trial in range(25):
        n_alleles = int(rng.integers(2, 5))
        n_samples = int(rng.integers(1, 12))
        pl_len = n_alleles * (n_alleles + 1) // 2
        var = Variant(abs_pos=100 + trial, seqs=[bytes([65 + a]) for a in range(n_alleles)])
        for _ in range(n_samples):
            phred = rng.integers(0, 99, size=pl_len)
            phred[rng.integers(0, pl_len)] = 0  # ensure a call
            cov = rng.integers(0, 25, size=n_alleles)
            var.calls.append(
                SampleCall(
                    phred=phred.astype(np.int64),
                    coverage=cov.astype(np.int64),
                    ambiguous_depth=int(rng.integers(0, 4)),
                )
            )
        var.generate_infos()
        infos = var.infos

        # brute-force recomputation
        def gt_of(c):
            i = 0
            for y in range(n_alleles):
                for x in range(y + 1):
                    if c.phred[i] == 0:
                        return x, y
                    i += 1
            return 0, 0

        gts = [gt_of(c) for c in var.calls]
        ac = [0] * n_alleles
        for a, b in gts:
            ac[a] += 1
            ac[b] += 1
        n_genotyped = sum(1 for c in var.calls if (c.phred != 0).any())
        assert infos["AC"] == ",".join(str(x) for x in ac[1:])
        assert infos["AN"] == str(2 * n_genotyped)
        if n_genotyped:
            for got, want in zip(infos["AF"].split(","), ac[1:]):
                assert abs(float(got) - want / (2 * n_genotyped)) < 1e-3
        # het/hom allele balance
        het0 = sum(int(c.coverage[a]) for c, (a, b) in zip(var.calls, gts) if a != b)
        het1 = sum(int(c.coverage[b]) for c, (a, b) in zip(var.calls, gts) if a != b)
        if het0 + het1:
            assert abs(float(infos["ABHet"]) - het1 / (het0 + het1)) < 1e-3
        else:
            assert infos["ABHet"] == "-1"
        hom_called = sum(int(c.coverage[a]) for c, (a, b) in zip(var.calls, gts) if a == b)
        hom_other = sum(
            int(c.coverage.sum()) - int(c.coverage[a])
            for c, (a, b) in zip(var.calls, gts)
            if a == b
        )
        if hom_called + hom_other:
            assert abs(float(infos["ABHom"]) - hom_called / (hom_called + hom_other)) < 1e-3
        # NHet/NHomRef/NHomAlt per alt
        for e in range(1, n_alleles):
            nhet = sum(1 for a, b in gts if (a == e) != (b == e))
            nhomalt = sum(1 for a, b in gts if a == e and b == e)
            nhomref = sum(1 for a, b in gts if a != e and b != e)
            assert int(infos["NHet"].split(",")[e - 1]) == nhet
            assert int(infos["NHomAlt"].split(",")[e - 1]) == nhomalt
            assert int(infos["NHomRef"].split(",")[e - 1]) == nhomref
        # SeqDepth = sum of coverage + ambiguous
        assert infos["SeqDepth"] == str(
            sum(int(c.coverage.sum()) + c.ambiguous_depth for c in var.calls)
        )
        # MaxAAS = max per-alt coverage over samples
        for e in range(1, n_alleles):
            assert int(infos["MaxAAS"].split(",")[e - 1]) == max(
                int(c.coverage[e]) for c in var.calls
            )
        # QUAL-by-depth from the brute-force definition
        tq = td = 0
        for c in var.calls:
            if len(c.phred) and c.phred[0] > 0:
                depth = min(10, int(c.coverage[1:].sum()) + c.ambiguous_depth)
                if depth > 0:
                    tq += min(25 * depth, int(c.phred[0]))
                    td += depth
        want_qd = tq / td if td else 0.0
        assert abs(float(infos["QD"]) - want_qd) < 1e-2


def test_decomposition_projects_var_stats():
    """variant.cpp:34-80 update_per_allele_stats: decomposed variants carry
    the whole-variant scalars (clipped_reads, mapq_squared) and merge the
    per-allele alignment accumulators + read-strand counters through the
    allele map. Regression: these were dropped, zeroing MQ/MQsquared/MQSal/
    CRal/SDal/MMal (and the MQ feature of AAScore/LOGF) on every decomposed
    record."""
    from graphtyper_tpu.models.genotype_model import VarStats
    from graphtyper_tpu.typer.variant import make_biallelic

    var = Variant(abs_pos=500, seqs=[b"ACA", b"GCA", b"ACT"])
    var.calls = [
        _call([40, 0, 70, 50, 90, 95], [4, 5, 0]),
        _call([30, 40, 70, 0, 90, 95], [5, 0, 4]),
    ]
    var.stats = VarStats.sized(3)
    var.stats.clipped_reads = 7
    var.stats.mapq_squared = 3600 * 11
    for a, (mq, mm, sd, cb) in enumerate([(3600 * 5, 4, 12, 30), (3600 * 4, 2, 5, 0), (3600 * 2, 1, 3, 8)]):
        pa = var.stats.per_allele[a]
        pa.mapq_squared, pa.mismatches, pa.score_diff, pa.clipped_bp = mq, mm, sd, cb
        var.stats.read_strand[a].r1_forward = a + 1
        var.stats.read_strand[a].r2_reverse = 2 * a

    out = break_multi_snps(var)
    assert len(out) == 2
    for nv in out:
        # scalars copy through unchanged
        assert nv.stats.clipped_reads == 7
        assert nv.stats.mapq_squared == 3600 * 11
    # first SNP maps alleles 0,2 -> 0 and 1 -> 1
    st = out[0].stats
    assert st.per_allele[0].mapq_squared == 3600 * 7
    assert st.per_allele[1].mapq_squared == 3600 * 4
    assert st.per_allele[0].mismatches == 5
    assert st.per_allele[0].score_diff == 15
    assert st.per_allele[0].clipped_bp == 38
    assert st.read_strand[0].r1_forward == 4  # alleles 0 and 2
    assert st.read_strand[0].r2_reverse == 4
    assert st.read_strand[1].r1_forward == 2

    # make_biallelic projects the same way (variant.cpp:1644)
    bi = make_biallelic(var)
    assert bi[0].stats.mapq_squared == 3600 * 11
    assert bi[0].stats.per_allele[1].mapq_squared == 3600 * 4
    assert bi[1].stats.per_allele[0].mapq_squared == 3600 * 9  # alleles 0+1 fold to ref
