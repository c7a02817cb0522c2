"""SV pool parse is region-gated (reference genotype_sv.cpp reads regions
through index iterators, not whole contigs):

- the record set is "reads overlapping the padded region" and is applied
  identically by the native C++ parse (gt_align.cpp parse_bam_pool) and the
  Python object path (caller.read_pool_records position_filter);
- a .bai turns the byte decode into an index slice (io/bai.py) with
  byte-identical output — the slice is a superset, the exact filter decides;
- off-region reads are really dropped (the parse shrinks).
"""

import gzip
import shutil
from dataclasses import replace

import numpy as np

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.pipeline.genotype import genotype_sv
from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta
from tests.pipeline.test_sv_e2e import _sim_reads, _write_sv_vcf


def _body(path):
    return [l for l in gzip.open(path, "rt").read().splitlines() if not l.startswith("#")]


def _make_inputs(tmp_path):
    rng = np.random.default_rng(41)
    L = 30_000
    chrom = "chrS"
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, chrom, seq)

    del_start0 = 15_000
    size = 180
    sv_vcf = str(tmp_path / "sv.vcf")
    _write_sv_vcf(sv_vcf, chrom, del_start0 + 1, chr(seq[del_start0]), size, del_start0 + 1 + size)

    hap_del = np.concatenate([seq[: del_start0 + 1], seq[del_start0 + 1 + size :]])
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.io.bam_writer import write_bam

    bams = []
    for s in range(2):
        sam = str(tmp_path / f"s{s}.sam")
        haps = [seq, hap_del] if s == 0 else [seq, seq]
        # reads across the WHOLE contig — most are outside the SV region
        _sim_reads(sam, chrom, L, haps, 1800, f"s{s}", 200 + s)
        header, reads = read_alignments(sam)
        bam = sam[:-4] + ".bam"
        write_bam(bam, header, list(reads))
        bams.append(bam)
    # region in the middle: reads left of begin-1000 are outside the padded
    # window (genotype_sv pads end+200000 then 1000 each side)
    region = f"{chrom}:12001-18000"
    return fasta, sv_vcf, bams, region, chrom


def test_indexed_slice_matches_full_decode(tmp_path):
    fasta, sv_vcf, bams, region, chrom = _make_inputs(tmp_path)

    # indexed copies: the native parse byte-slices through the BAI
    idx_dir = tmp_path / "indexed"
    idx_dir.mkdir()
    from graphtyper_tpu.io.bai import ensure_bai

    indexed = []
    for b in bams:
        dst = str(idx_dir / b.rsplit("/", 1)[-1])
        shutil.copyfile(b, dst)
        assert ensure_bai(dst, min_size=0)
        indexed.append(dst)

    out_plain = genotype_sv(fasta, sv_vcf, bams, region, str(tmp_path / "out_plain"))
    out_idx = genotype_sv(fasta, sv_vcf, indexed, region, str(tmp_path / "out_idx"))
    body = _body(out_plain)
    assert body, "no SV records emitted"
    assert body == _body(out_idx)


def test_native_matches_object_path(tmp_path):
    fasta, sv_vcf, bams, region, chrom = _make_inputs(tmp_path)
    old = current_options()
    try:
        out_native = genotype_sv(fasta, sv_vcf, bams, region, str(tmp_path / "out_nat"))
        set_options(replace(old, native_caller="off"))
        out_obj = genotype_sv(fasta, sv_vcf, bams, region, str(tmp_path / "out_obj"))
    finally:
        set_options(old)
    body = _body(out_native)
    assert body, "no SV records emitted"
    assert body == _body(out_obj)


def test_position_filter_shrinks_parse(tmp_path):
    fasta, sv_vcf, bams, region, chrom = _make_inputs(tmp_path)
    from graphtyper_tpu.graph.coords import GenomicRegion
    from graphtyper_tpu.io.native import get_lib
    from graphtyper_tpu.pipeline import native_caller as nc

    lib = get_lib()
    assert lib is not None
    nc._setup_lib(lib)
    padded = GenomicRegion.parse(region)
    padded.pad_end(200000)
    padded.pad(1000)
    full = nc._get_prep(lib, bams, padded, 3840, False, position_filter=False)
    gated = nc._get_prep(lib, bams, padded, 3840, False, position_filter=True)
    assert gated.n_reads < full.n_reads
    # everything overlapping the window is retained: reads fully left of
    # begin are exactly the dropped set
    assert gated.n_reads > 0
