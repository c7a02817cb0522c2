import numpy as np

from graphtyper_tpu.io.bam import read_sam, pack_reads
from graphtyper_tpu.io.bgzf import BgzfWriter, decompress_all
from graphtyper_tpu.io.fasta import FastaFile
from graphtyper_tpu.io.tabix import TabixIndex
from graphtyper_tpu.io.vcf_io import VcfReader
from graphtyper_tpu.utils.dna import encode, decode, pack_kmers, unpack_kmer, revcomp_ascii


def test_fasta_fetch(data_dir):
    fa = FastaFile(str(data_dir / "index_test.fa"))
    assert fa.has_contig("chr1")
    seq = fa.fetch("chr1")
    assert len(seq) == fa.contig_length("chr1")
    assert seq[:10] == b"AGGTTTCCCC"
    # pos 37 1-based is 'C' (from the fixture VCF ref allele at chr1:37)
    assert fa.fetch("chr1", 36, 37) == b"C"
    assert fa.fetch("chr2", 1, 2) == b"C"


def test_vcf_reader_plain_and_gz(data_dir):
    recs_gz = VcfReader(str(data_dir / "index_test.vcf.gz")).read_all()
    recs_txt = VcfReader(str(data_dir / "index_test.vcf")).read_all()
    assert len(recs_gz) == len(recs_txt)
    r = recs_gz[0]
    assert (r.chrom, r.pos, r.ref, r.alts) == ("chr1", 36, "C", ["G"])
    multi = [r for r in recs_gz if len(r.alts) > 1][0]
    assert multi.alts == ["G", "GA"]
    sv = [r for r in recs_gz if r.alts and r.alts[0].startswith("<DEL")][0]
    assert sv.info_dict()["SVTYPE"] == "DEL"


def test_vcf_tabix_region(data_dir):
    rd = VcfReader(str(data_dir / "index_test.vcf.gz"))
    recs = rd.read_region("chr2", 0, 10)
    assert [r.pos for r in recs] == [1, 2]


def test_tabix_roundtrip(tmp_path, data_dir):
    idx = TabixIndex.load(str(data_dir / "index_test.vcf.gz.tbi"))
    assert "chr1" in idx.names
    out = tmp_path / "copy.tbi"
    idx.save(str(out))
    idx2 = TabixIndex.load(str(out))
    assert idx2.names == idx.names
    assert idx2.bins == idx.bins
    assert idx2.linear == idx.linear


def test_bgzf_writer_roundtrip(tmp_path):
    p = tmp_path / "x.gz"
    w = BgzfWriter(str(p))
    payload = b"hello world\n" * 20000
    w.write(payload)
    w.close()
    assert decompress_all(str(p)) == payload
    import gzip

    with gzip.open(str(p)) as f:
        assert f.read() == payload


def test_sam_reader(data_dir):
    header, reads = read_sam(str(data_dir / "test.sam"))
    assert header.ref_names[:2] == ["chr1", "chr2"]
    assert len(reads) > 100
    r = reads[0]
    assert len(r.seq) == len(r.qual)
    batch = pack_reads(reads[:50])
    assert batch.seqs.shape[0] == 50
    assert decode(batch.seqs[0][: batch.lens[0]]) == reads[0].seq.decode()


def test_dna_kmers():
    seq = encode(b"ACGTACGTACGTACGTACGTACGTACGTACGTA")  # 33 bases
    kmers, valid = pack_kmers(seq, 32)
    assert len(kmers) == 2
    assert valid.all()
    assert unpack_kmer(int(kmers[0]), 32) == "ACGTACGTACGTACGTACGTACGTACGTACGT"
    assert unpack_kmer(int(kmers[1]), 32) == "CGTACGTACGTACGTACGTACGTACGTACGTA"
    seq_n = encode(b"ACGTNCGT" + b"A" * 30)
    _, valid_n = pack_kmers(seq_n, 32)
    assert not valid_n[0] and valid_n[5]
    assert revcomp_ascii(b"ACGGT") == b"ACCGT"


def test_read_index_test_vcf_golden(data_dir):
    """Golden port of test/typer/test_vcf_io.cpp:13-44: first record abs pos
    and allele counts of the shared fixture VCF."""
    from graphtyper_tpu.pipeline.vcf_tools import read_vcf_with_calls

    vcf, contigs = read_vcf_with_calls(str(data_dir / "index_test.vcf.gz"))
    vars_ = vcf.variants
    assert vars_[0].abs_pos == 37
    assert [len(v.seqs) for v in vars_[:5]] == [2, 2, 2, 3, 2]
    assert vcf.sample_names == []


def test_csi_index_roundtrip(tmp_path):
    """--is_csi writes a CSI index whose region queries match the tabix
    queries (vcf.cpp write_tbi_index csi branch)."""
    import gzip

    from graphtyper_tpu.config import current_options, replace, set_options
    from graphtyper_tpu.io.tabix import CsiIndex, load_index
    from graphtyper_tpu.io.vcf_io import VcfReader
    from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf
    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=8000, coverage=14.0, seed=41)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    old = current_options()
    try:
        set_options(replace(old, is_csi=True))
        out_csi = genotype_only_with_a_vcf(
            sim.fasta, sim.sams, sim.vcf, f"{cfg.chrom}:1-8000", str(tmp_path / "csi")
        )
        set_options(replace(old, is_csi=False))
        out_tbi = genotype_only_with_a_vcf(
            sim.fasta, sim.sams, sim.vcf, f"{cfg.chrom}:1-8000", str(tmp_path / "tbi")
        )
    finally:
        set_options(old)
    import os

    assert os.path.exists(out_csi + ".csi") and not os.path.exists(out_csi + ".tbi")
    assert isinstance(load_index(out_csi + ".csi"), CsiIndex)
    r1 = VcfReader(out_csi).read_region(cfg.chrom, 2000, 6000)
    r2 = VcfReader(out_tbi).read_region(cfg.chrom, 2000, 6000)
    assert len(r1) == len(r2) > 0
    assert [(r.pos, r.ref, tuple(r.alts)) for r in r1] == [
        (r.pos, r.ref, tuple(r.alts)) for r in r2
    ]
