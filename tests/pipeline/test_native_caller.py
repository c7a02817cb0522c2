"""Native C++ pooled caller parity: gt_call_pool (alignment + dedup +
pairing + extraction + connections in C++) must reproduce the Python loop's
final site state, phasing map, and emitted calls bit-for-bit."""

import numpy as np
import pytest

from graphtyper_tpu.config import current_options, replace, set_options
from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.graph.coords import GenomicRegion
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.pipeline import native_caller
from graphtyper_tpu.pipeline.caller import call_pool
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(
    not native_caller.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    cfg = SimConfig(region_length=8000, coverage=20.0, n_samples=2, seed=31, error_rate=0.004)
    out = tmp_path_factory.mktemp("simncall")
    return cfg, simulate_cohort(str(out), cfg)


def _run(sim_pair, native: bool):
    cfg, res = sim_pair
    graph = construct_graph(res.fasta, res.vcf, f"{cfg.chrom}:1-{cfg.region_length}", use_index=True)
    index = index_graph(graph)
    region = GenomicRegion.parse(f"{cfg.chrom}:1-{cfg.region_length}")
    old = current_options()
    set_options(replace(old, native_caller="on" if native else "off", device_scoring="on"))
    try:
        return call_pool(graph, index, res.sams, region=region, is_writing_hap=True)
    finally:
        set_options(old)


def test_native_caller_parity(sim):
    py = _run(sim, native=False)
    na = _run(sim, native=True)
    assert na.num_records == py.num_records
    assert na.num_duplicated == py.num_duplicated
    assert len(py.scorer.sites) == len(na.scorer.sites)
    for sh, sd in zip(py.scorer.sites, na.scorer.sites):
        vh, vd = sh.var_stats, sd.var_stats
        assert vh.clipped_reads == vd.clipped_reads
        assert vh.mapq_squared == vd.mapq_squared
        for ah, ad in zip(vh.per_allele, vd.per_allele):
            assert (ah.clipped_bp, ah.mapq_squared, ah.mismatches, ah.score_diff) == (
                ad.clipped_bp,
                ad.mapq_squared,
                ad.mismatches,
                ad.score_diff,
            )
        for rh, rd in zip(vh.read_strand, vd.read_strand):
            assert (rh.r1_forward, rh.r1_reverse, rh.r2_forward, rh.r2_reverse) == (
                rd.r1_forward,
                rd.r1_reverse,
                rd.r2_forward,
                rd.r2_reverse,
            )
        for hh, hd in zip(sh.hap_samples, sd.hap_samples):
            np.testing.assert_array_equal(hh.log_score, hd.log_score)
            np.testing.assert_array_equal(hh.gt_coverage, hd.gt_coverage)
            assert hh.max_log_score == hd.max_log_score
            assert (hh.ambiguous_depth, hh.ambiguous_depth_alt, hh.alt_proper_pair_depth) == (
                hd.ambiguous_depth,
                hd.ambiguous_depth_alt,
                hd.alt_proper_pair_depth,
            )

    # connections drive the phasing map: compare both
    for cs_py, cs_na in zip(py.scorer.connections, na.scorer.connections):
        for m_py, m_na in zip(cs_py, cs_na):
            assert m_py.keys() == m_na.keys()
            for b1 in m_py:
                assert m_py[b1].keys() == m_na[b1].keys()
                for h2 in m_py[b1]:
                    np.testing.assert_array_equal(m_py[b1][h2], m_na[b1][h2])
    assert py.ph == {k: v for k, v in na.ph.items()}

    assert len(py.vcf.variants) == len(na.vcf.variants)
    for a, b in zip(py.vcf.variants, na.vcf.variants):
        assert a.abs_pos == b.abs_pos and a.seqs == b.seqs
        for ca, cb in zip(a.calls, b.calls):
            np.testing.assert_array_equal(ca.phred, cb.phred)
            np.testing.assert_array_equal(ca.coverage, cb.coverage)


def test_bam_bytes_fast_path_parity(tmp_path):
    """The BAM-bytes fast path (gt_call_pool_bam: no AlignedRead objects)
    must match the object-based Python loop state-for-state."""
    cfg = SimConfig(region_length=8000, coverage=18.0, n_samples=2, seed=37, out_format="bam", error_rate=0.004)
    sim = simulate_cohort(str(tmp_path), cfg)

    def run(native):
        graph = construct_graph(sim.fasta, sim.vcf, f"{cfg.chrom}:1-{cfg.region_length}", use_index=True)
        index = index_graph(graph)
        region = GenomicRegion.parse(f"{cfg.chrom}:1-{cfg.region_length}")
        old = current_options()
        set_options(replace(old, native_caller="on" if native else "off", device_scoring="on"))
        try:
            return call_pool(graph, index, sim.sams, region=region, is_writing_hap=True)
        finally:
            set_options(old)

    py = run(False)
    na = run(True)
    assert na.num_records == py.num_records
    assert na.num_duplicated == py.num_duplicated
    assert na.vcf.sample_names == py.vcf.sample_names
    for sh, sd in zip(py.scorer.sites, na.scorer.sites):
        for hh, hd in zip(sh.hap_samples, sd.hap_samples):
            np.testing.assert_array_equal(hh.log_score, hd.log_score)
            np.testing.assert_array_equal(hh.gt_coverage, hd.gt_coverage)
    assert py.ph == dict(na.ph)
    for a, b in zip(py.vcf.variants, na.vcf.variants):
        assert a.abs_pos == b.abs_pos and a.seqs == b.seqs
        for ca, cb in zip(a.calls, b.calls):
            np.testing.assert_array_equal(ca.phred, cb.phred)
            np.testing.assert_array_equal(ca.coverage, cb.coverage)
