"""Native discovery first pass parity: gt_first_pass must reproduce the
Python pileup + gates + phase analysis event-for-event."""

import gzip

import numpy as np
import pytest

from graphtyper_tpu.config import current_options, replace, set_options
from graphtyper_tpu.io.native import available
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(not available(), reason="native library not built")


def _python_first_pass(path, chrom, region_begin, reference):
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.typer.discovery import run_first_pass

    header, reads = read_alignments(path, parse_tags=True)
    reads = [r for r in reads if r.ref_id >= 0 and header.ref_names[r.ref_id] == chrom]
    reads.sort(key=lambda r: r.pos)
    return run_first_pass(reads, region_begin, reference, opts=current_options())


def _native_first_pass(path, chrom, region_begin, reference):
    from graphtyper_tpu.pipeline.native_caller import _bam_bytes, _parse_bam_header_meta
    from graphtyper_tpu.typer.native_discovery import run_first_pass_native

    data = _bam_bytes(path)
    ref_names, _samples, _text = _parse_bam_header_meta(data)
    target = ref_names.index(chrom)
    return run_first_pass_native(data, target, region_begin, reference, current_options())


def _assert_equal(py, na):
    pb, ph = py
    nb, nh = na
    assert len(pb) == len(nb), (len(pb), len(nb))
    n_events = 0
    for b1, b2 in zip(pb, nb):
        assert sorted(b1.events.keys()) == sorted(b2.events.keys())
        for ev in b1.events:
            i1, i2 = b1.events[ev], b2.events[ev]
            n_events += 1
            for f in (
                "hq_count", "lq_count", "proper_pairs", "first_in_pairs",
                "sequence_reversed", "clipped", "max_mapq", "max_distance",
                "uniq_pos1", "uniq_pos2", "uniq_pos3", "span",
                "has_indel_good_support", "has_realignment_support", "max_log_qual",
            ):
                assert getattr(i1, f) == getattr(i2, f), (ev, f, getattr(i1, f), getattr(i2, f))
    assert set(ph.keys()) == set(nh.keys())
    for ev in ph:
        assert ph[ev].ever_together == nh[ev].ever_together, ev
        assert ph[ev].always_together == nh[ev].always_together, ev
    return n_events, len(ph)


def test_first_pass_parity(tmp_path):
    cfg = SimConfig(region_length=20000, coverage=25.0, seed=131, out_format="bam", error_rate=0.006)
    sim = simulate_cohort(str(tmp_path), cfg)
    ref = open(sim.fasta).read().split("\n", 1)[1].replace("\n", "").encode()
    py = _python_first_pass(sim.sams[0], cfg.chrom, 0, ref)
    na = _native_first_pass(sim.sams[0], cfg.chrom, 0, ref)
    n_events, n_haps = _assert_equal(py, na)
    assert n_haps > 10  # the workload produced real events


def test_first_pass_parity_with_offset_region(tmp_path):
    cfg = SimConfig(region_length=15000, coverage=20.0, seed=132, out_format="bam", indel_rate=1 / 900.0)
    sim = simulate_cohort(str(tmp_path), cfg)
    ref_full = open(sim.fasta).read().split("\n", 1)[1].replace("\n", "").encode()
    begin = 2000
    ref = ref_full[begin:12000]
    py = _python_first_pass(sim.sams[0], cfg.chrom, begin, ref)
    na = _native_first_pass(sim.sams[0], cfg.chrom, begin, ref)
    _assert_equal(py, na)


def test_discovery_e2e_native_vs_python(tmp_path):
    """streamlined_discovery with the native first pass produces the
    identical sites VCF to the pure-Python pass."""
    from graphtyper_tpu.graph.coords import AbsolutePosition
    from graphtyper_tpu.io.fasta import FastaFile
    from graphtyper_tpu.typer.discovery import streamlined_discovery

    cfg = SimConfig(region_length=15000, coverage=22.0, seed=133, out_format="bam")
    sim = simulate_cohort(str(tmp_path), cfg)

    def run(native):
        old = current_options()
        set_options(replace(old, native_caller="on" if native else "off"))
        try:
            names = []
            return streamlined_discovery(sim.sams, sim.fasta, f"{cfg.chrom}:1-{cfg.region_length}", names), names
        finally:
            set_options(old)

    py_vcf, py_names = run(False)
    na_vcf, na_names = run(True)
    assert py_names == na_names
    assert len(py_vcf.variants) == len(na_vcf.variants) > 3
    for a, b in zip(py_vcf.variants, na_vcf.variants):
        assert a.abs_pos == b.abs_pos
        assert a.seqs == b.seqs
        assert a.infos == b.infos
