"""Long-read golden suite (VERDICT r4 #8): hand-computed edge cases for the
PL-from-pileup formulas (caller.cpp:3389-3423), the SNP candidate gates
(caller.cpp:3246-3290), and the qual-rescale boundaries (run_first_pass_lr,
caller.cpp:1367-1505: quals rescale to 15-27 via 15 + round(min(q,60)*12/60)),
plus an end-to-end het call through streamlined_lr_genotyping."""

import gzip

import numpy as np

from graphtyper_tpu.config import Options
from graphtyper_tpu.io.bam import AlignedRead
from graphtyper_tpu.typer.discovery_lr import (
    _TR_QUAL,
    lr_pileup,
    lr_pl_from_pileup,
    lr_snp_candidates,
    streamlined_lr_genotyping,
)
from graphtyper_tpu.utils.simulate import _write_fasta


def test_qual_rescale_boundaries():
    """tr_qual = 15 + round(min(q,60) * 12/60): floor 15, ceiling 27, the
    26->27 step lands between q=57 and q=58, and q>60 clamps."""
    assert _TR_QUAL[1] == 15
    assert _TR_QUAL[2] == 15  # round(0.4) = 0
    assert _TR_QUAL[3] == 16  # round(0.6) = 1
    assert _TR_QUAL[5] == 16
    assert _TR_QUAL[57] == 26  # round(11.4) = 11
    assert _TR_QUAL[58] == 27  # round(11.6) = 12
    assert _TR_QUAL[60] == 27
    assert _TR_QUAL[61] == 27 and _TR_QUAL[255] == 27  # min(q, 60) clamp
    # no half-way rounding exists: q*12/60 = q/5 never has a .5 fraction
    assert all(_TR_QUAL[q] == 15 + round(min(q, 60) / 5) for q in range(256))


def test_zero_qual_bases_are_skipped():
    """q == 0 bases contribute neither count nor qualsum (the pileup gate,
    not a tr_qual of 15)."""
    seq = b"ACGT" * 50
    qual = np.full(200, 40, np.uint8)
    qual[:100] = 0
    r = AlignedRead(name="r", flag=0, ref_id=0, pos=0, mapq=60,
                    cigar=[(0, 200)], mate_ref_id=-1, mate_pos=-1, tlen=0,
                    seq=seq, qual=qual, tags={})
    counts, qs = lr_pileup([r], 0, 200, Options())
    assert counts[:100].sum() == 0 and qs[:100].sum() == 0
    assert counts[100:].sum() == 100
    assert qs[100:].sum() == 100 * _TR_QUAL[40]


def test_pl_hand_computed_biallelic():
    """bc=(10 ref A, 5 alt C), qs=(200, 90): hom-ref = 290-200 = 90,
    het = 290-200-90+3*15 = 45, hom-alt = 290-90 = 200; normalized by the
    het minimum -> [45, 0, 155]."""
    bc = np.array([10, 5, 0, 0], np.int64)
    qs = np.array([200, 90, 0, 0], np.int64)
    np.testing.assert_array_equal(lr_pl_from_pileup(bc, qs, [0, 1]), [45, 0, 155])


def test_pl_hand_computed_triallelic_and_clamp():
    bc = np.array([6, 5, 4, 1], np.int64)
    qs = np.array([150, 120, 100, 20], np.int64)
    # triangle order (0,0),(0,1),(1,1),(0,2),(1,2),(2,2); raw
    # [240,153,270,170,197,290] minus min 153
    np.testing.assert_array_equal(
        lr_pl_from_pileup(bc, qs, [0, 1, 2]), [87, 0, 117, 17, 44, 137]
    )
    # clamp at 255: hom-alt deficit 600 exceeds the cap
    bc2 = np.array([20, 0, 0, 0], np.int64)
    qs2 = np.array([600, 0, 0, 0], np.int64)
    np.testing.assert_array_equal(lr_pl_from_pileup(bc2, qs2, [0, 1]), [0, 60, 255])


def test_pl_empty_pileup_is_flat():
    z = np.zeros(4, np.int64)
    np.testing.assert_array_equal(lr_pl_from_pileup(z, z, [0, 1]), [0, 0, 0])


def test_snp_gate_first_base_boundaries():
    """Top-base gate: bc>=3 AND (gap>=30 over second OR >=50 over third)."""
    L = 5
    counts = np.zeros((L, 4), np.int64)
    qs = np.zeros((L, 4), np.int64)
    ref = np.zeros(L, np.uint8)  # all A
    counts[0, 1], qs[0, 1] = 3, 45  # gap 45 >= 30 -> event
    counts[1, 1], qs[1, 1] = 3, 29  # gap 29 < 30 and < 50 -> no event
    counts[2, 1], qs[2, 1] = 2, 45  # bc 2 < 3 -> no event
    # gap over second only 20, but >= 50 over third rescues
    counts[3, 1], qs[3, 1] = 5, 100
    counts[3, 2], qs[3, 2] = 2, 80  # bc 2 -> no second-base event
    counts[4, 1], qs[4, 1] = 3, 30  # gap exactly 30 -> event (>=)
    events = lr_snp_candidates(counts, qs, ref)
    assert events == {(0, 1), (3, 1), (4, 1)}, events


def test_snp_gate_second_base_boundaries():
    """Runner-up gate: bc>=4 AND gap>=50 over third AND share STRICTLY >0.3
    of the total qualsum; the reference base itself never becomes an event."""
    L = 5
    counts = np.zeros((L, 4), np.int64)
    qs = np.zeros((L, 4), np.int64)
    ref = np.zeros(L, np.uint8)
    # pass: ratio 90/279 > 0.3, gap 90 >= 50, bc 5 >= 4 (first is ref: no
    # first-base event)
    counts[0, 0], qs[0, 0] = 7, 189
    counts[0, 1], qs[0, 1] = 5, 90
    # ratio exactly 0.3 fails (strict >)
    counts[1, 0], qs[1, 0] = 8, 210
    counts[1, 1], qs[1, 1] = 5, 90
    # bc_s 3 < 4 fails
    counts[2, 0], qs[2, 0] = 7, 189
    counts[2, 1], qs[2, 1] = 3, 90
    # gap over third 49 < 50 fails
    counts[3, 0], qs[3, 0] = 7, 189
    counts[3, 1], qs[3, 1] = 5, 90
    counts[3, 2], qs[3, 2] = 2, 41
    events = lr_snp_candidates(counts, qs, ref)
    assert events == {(0, 1)}, events


def test_snp_gate_skips_ambiguous_reference():
    """Positions whose reference base is N (code >= 4) emit nothing."""
    counts = np.zeros((2, 4), np.int64)
    qs = np.zeros((2, 4), np.int64)
    counts[:, 1] = 10
    qs[:, 1] = 300
    ref = np.array([4, 1], np.uint8)  # N, then C (C IS the top base -> ref)
    assert lr_snp_candidates(counts, qs, ref) == set()


def test_lr_e2e_het_snp(tmp_path):
    """streamlined_lr_genotyping end to end: 10 ref + 10 alt 400bp reads over
    a C>T het at position 701 (1-based). Event from the >=50-over-third arm
    (the two top bases tie), PL [170, 0, 170] from the hand formula, equal
    allele coverage."""
    rng = np.random.default_rng(4242)
    L = 2000
    seq = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, L)].copy()
    seq[700] = ord("C")
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, "chrL", seq)
    alt = seq.copy()
    alt[700] = ord("T")
    sam = str(tmp_path / "lr.sam")
    with open(sam, "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrL\tLN:2000\n@RG\tID:rg\tSM:lrs\n")
        for i in range(20):
            hap = seq if i % 2 == 0 else alt
            start = 400 + 10 * (i // 2)
            bases = hap[start : start + 400].tobytes().decode()
            f.write(f"r{i}\t0\tchrL\t{start + 1}\t60\t400M\t*\t0\t0\t{bases}\t{'I' * 400}\n")
    vcf = streamlined_lr_genotyping([sam], fasta, "chrL:1-2000")
    assert vcf.sample_names == ["lrs"]
    recs = [v for v in vcf.variants]
    assert len(recs) == 1
    v = recs[0]
    assert v.seqs == [b"C", b"T"]
    call = v.calls[0]
    # 10 reads x tr_qual(40)=23 per allele: hom deficits 230, het 3*20=60
    np.testing.assert_array_equal(call.phred, [170, 0, 170])
    np.testing.assert_array_equal(call.coverage, [10, 10])
