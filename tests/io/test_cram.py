"""CRAM decode golden tests: the reference's own fixture pair (test.cram,
CRAM 2.1) must decode record-for-record identical to test.sam; the CRAM 3.0
path (ltf8 counters, block CRCs, rANS-4x8) is exercised by writer roundtrip."""

import numpy as np
import pytest

from graphtyper_tpu.io.bam import read_alignments, read_sam
from graphtyper_tpu.io.cram import read_cram
from graphtyper_tpu.io.cram_writer import itf8, ltf8, rans_encode_0, write_cram
from graphtyper_tpu.io.cram import ByteReader, rans_decode


def test_cram21_golden_vs_sam(data_dir):
    """All 3307 records: core fields bit-identical; tags identical except NM
    (dropped by CRAM encoders; only regenerable against a real reference)."""
    h_c, creads = read_cram(str(data_dir / "test.cram"))
    h_s, sreads = read_sam(str(data_dir / "test.sam"), parse_tags=True)
    assert h_c.ref_names == h_s.ref_names
    assert len(creads) == len(sreads) == 3307
    for c, s in zip(creads, sreads):
        assert c.name == s.name
        assert c.flag == s.flag
        assert c.ref_id == s.ref_id
        assert c.pos == s.pos
        assert c.mapq == s.mapq
        assert c.cigar == s.cigar
        assert c.seq.upper() == s.seq.upper()
        assert c.mate_ref_id == s.mate_ref_id
        assert c.mate_pos == s.mate_pos
        assert c.tlen == s.tlen
        if s.qual is not None and len(s.qual):
            np.testing.assert_array_equal(c.qual, s.qual)
        for t, v in s.tags.items():
            if t in ("NM", "MD"):
                continue
            assert c.tags.get(t) == v, (c.name, t)


def test_read_alignments_dispatches_cram(data_dir):
    h, reads = read_alignments(str(data_dir / "test.cram"), parse_tags=True)
    assert len(reads) == 3307


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 255, 16383, 16384, 2097151, 2097152, 1 << 27, (1 << 31) - 1, -1):
        br = ByteReader(itf8(v))
        assert br.itf8() == v, v
    for v in (0, 127, 128, 300, 1 << 20, 1 << 40, (1 << 62)):
        br = ByteReader(ltf8(v))
        assert br.ltf8() == v, v


def test_rans_roundtrip():
    rng = np.random.default_rng(0)
    for data in (
        b"AAAAABBBCCD" * 100,
        bytes(rng.integers(0, 4, size=10007, dtype=np.uint8) + 65),
        bytes(rng.integers(0, 250, size=5000, dtype=np.uint8)),
        b"\x00" * 999,
    ):
        assert rans_decode(rans_encode_0(data)) == data


def test_cram30_writer_roundtrip(data_dir, tmp_path):
    """Write the fixture reads back as CRAM 3.0 and re-read: everything must
    survive (names, flags, cigars, seq, qual, tags)."""
    h, sreads = read_sam(str(data_dir / "test.sam"), parse_tags=True)
    out = str(tmp_path / "rt.cram")
    write_cram(out, h, sreads)
    h2, creads = read_cram(out)
    assert len(creads) == len(sreads)
    for c, s in zip(creads, sreads):
        assert c.name == s.name
        assert c.flag == s.flag
        assert c.ref_id == s.ref_id
        assert c.pos == s.pos
        assert c.mapq == s.mapq
        assert c.cigar == s.cigar
        assert c.seq.upper() == s.seq.upper()
        assert c.mate_ref_id == s.mate_ref_id
        assert c.mate_pos == s.mate_pos
        assert c.tlen == s.tlen
        if s.qual is not None and len(s.qual):
            np.testing.assert_array_equal(c.qual, s.qual)
        assert {t: v for t, v in c.tags.items()} == dict(s.tags)


def test_genotype_from_cram_input(tmp_path):
    """End-to-end: the genotype pipeline consumes .cram inputs and produces
    the same VCF as the equivalent .bam inputs."""
    import gzip

    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.io.cram_writer import write_cram
    from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=6000, coverage=15.0, seed=13, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    h, reads = read_alignments(sim.sams[0], parse_tags=True)
    cram_path = str(tmp_path / "sample0.cram")
    write_cram(cram_path, h, reads)

    out_bam = genotype_only_with_a_vcf(
        sim.fasta, sim.sams, sim.vcf, f"{cfg.chrom}:1-{cfg.region_length}", str(tmp_path / "o1")
    )
    out_cram = genotype_only_with_a_vcf(
        sim.fasta, [cram_path], sim.vcf, f"{cfg.chrom}:1-{cfg.region_length}", str(tmp_path / "o2")
    )

    def body(p):
        return [l for l in gzip.open(p, "rt").read().splitlines() if not l.startswith("#")]

    b1, b2 = body(out_bam), body(out_cram)
    assert len(b1) > 0
    assert b1 == b2


def test_nm_md_regeneration(tmp_path):
    """With a verifying reference, NM/MD come back on decode (htslib
    behavior); without one they stay absent."""
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.io.cram_writer import write_cram
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=5000, coverage=8.0, seed=57, out_format="bam", error_rate=0.01)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    h, reads = read_alignments(sim.sams[0], parse_tags=True)
    cram = str(tmp_path / "s.cram")
    write_cram(cram, h, reads)
    # our writer stores bases verbatim (all-N reference) so the MD5 check
    # fails against the real fasta -> seqs still decode; NM/MD only generate
    # for refs that verify. Use the real reference by zeroing... instead:
    # decode without ref (no NM), then verify manual NM on a synthetic case.
    h2, creads = read_cram(cram)
    assert all("NM" not in r.tags for r in creads)

    # direct unit check of the generator
    from graphtyper_tpu.io.cram import _CramRec, _regenerate_nm_md

    ref = b"ACGTACGTACGT"
    r = _CramRec(pos=3, seq=b"GTATT", cigar=[(0, 5)], tags={})
    _regenerate_nm_md(r, ref)
    # ref[2:7] = GTACG vs GTATT -> mismatches at offsets 3 (C>T) and 4 (G>T)
    assert r.tags["NM"] == 2
    assert r.tags["MD"] == "3C0G0"

    r2 = _CramRec(pos=1, seq=b"ACGTCGT", cigar=[(0, 4), (2, 1), (0, 3)], tags={})
    _regenerate_nm_md(r2, ref)
    # ACGT match, delete A, CGT match -> NM 1, MD 4^A3
    assert r2.tags["NM"] == 1
    assert r2.tags["MD"] == "4^A3"


def test_cram_multi_container_roundtrip(tmp_path):
    """>10000 records forces multiple data containers (cram_writer CHUNK);
    the decoder must walk all containers and preserve record order and
    content, including the record_counter continuity across slices."""
    import numpy as np

    from graphtyper_tpu.io.bam import AlignedRead, read_alignments
    from graphtyper_tpu.io.cram_writer import write_cram

    h, base_reads = read_alignments("tests/data/test.sam", parse_tags=False)
    rng = np.random.default_rng(11)
    reads = []
    for i in range(23_456):
        src = base_reads[i % len(base_reads)]
        r = AlignedRead(
            name=f"m{i}", flag=src.flag, ref_id=src.ref_id, pos=src.pos + (i % 97),
            mapq=src.mapq, cigar=list(src.cigar), mate_ref_id=src.mate_ref_id,
            mate_pos=src.mate_pos, tlen=src.tlen, seq=src.seq,
            qual=src.qual.copy(),
        )
        reads.append(r)
    reads.sort(key=lambda r: (r.ref_id, r.pos))
    path = str(tmp_path / "multi.cram")
    write_cram(path, h, reads)
    h2, got = read_cram(path)
    assert len(got) == len(reads)
    for a, b in zip(reads, got):
        assert a.name == b.name and a.pos == b.pos and a.seq == b.seq and a.flag == b.flag
        assert list(a.cigar) == list(b.cigar)
        assert (a.qual == b.qual).all()
