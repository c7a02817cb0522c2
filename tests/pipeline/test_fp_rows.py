"""Split first-pass parity: extract -> aggregate -> gates must be
bit-identical to the monolithic native pass (gt_first_pass, the oracle),
for both aggregation twins (numpy host and the jitted device segment-sum).

Reference semantics under test: src/typer/caller.cpp:488-1365 (CIGAR pileup,
demotion, SNP/indel gates, phase analysis) via native/gt_first_pass.cpp.
"""

import os
import tempfile

import numpy as np
import pytest

from graphtyper_tpu.config import current_options
from graphtyper_tpu.io.fasta import FastaFile
from graphtyper_tpu.pipeline.native_caller import _bam_bytes, _parse_bam_header_meta
from graphtyper_tpu.typer import native_discovery as nd
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

pytestmark = pytest.mark.skipif(not nd.available(), reason="native lib unavailable")

FIELDS = (
    "hq_count", "lq_count", "proper_pairs", "first_in_pairs", "sequence_reversed",
    "clipped", "max_mapq", "max_distance", "uniq_pos1", "uniq_pos2", "uniq_pos3",
    "span", "max_log_qual", "has_indel_good_support", "has_realignment_support",
)


def _assert_same(a, b):
    ba, sa = a
    bb, sb = b
    assert len(ba) == len(bb)
    for x, y in zip(ba, bb):
        ka = sorted(x.events.keys(), key=lambda e: e.sort_key())
        kb = sorted(y.events.keys(), key=lambda e: e.sort_key())
        assert ka == kb
        for k in ka:
            ia, ib = x.events[k], y.events[k]
            for f in FIELDS:
                assert getattr(ia, f) == getattr(ib, f), (k, f)
            assert ia.phase == ib.phase
    assert sa.keys() == sb.keys()
    for k in sa:
        assert sa[k].ever_together == sb[k].ever_together
        assert sa[k].always_together == sb[k].always_together


def _files(seed: int, kb: int = 100, cov: float = 25.0, n: int = 2):
    tmp = tempfile.mkdtemp(prefix="gt_fp_rows_")
    cfg = SimConfig(region_length=kb * 1000, coverage=cov, n_samples=n, seed=seed,
                    out_format="bam")
    sim = simulate_cohort(os.path.join(tmp, "m"), cfg)
    fa = FastaFile(sim.fasta)
    ref = fa.fetch(cfg.chrom, 0, cfg.region_length)
    fa.close()
    out = []
    for p in sim.sams:
        data = _bam_bytes(p)
        meta = _parse_bam_header_meta(data)
        out.append((data, meta[0].index(cfg.chrom)))
    return out, ref


@pytest.mark.parametrize("seed", [3, 17, 51])
def test_rows_path_matches_monolith(seed):
    files, ref = _files(seed)
    opts = current_options()
    for data, target in files:
        a = nd.run_first_pass_native(data, target, 0, ref, opts)
        b = nd.run_first_pass_rows(data, target, 0, ref, opts)
        assert b is not None
        _assert_same(a, b)


def test_device_aggregation_matches_host():
    files, ref = _files(7)
    opts = current_options()
    for data, target in files:
        a = nd.run_first_pass_rows(data, target, 0, ref, opts, device=False)
        b = nd.run_first_pass_rows(data, target, 0, ref, opts, device=True)
        _assert_same(a, b)


def test_cohort_batched_aggregation_matches_per_file():
    files, ref = _files(23, n=4)
    xs = [nd.fp_extract(d, t, 0, ref) for d, t in files]
    assert all(x is not None for x in xs)
    batched = nd.aggregate_cohort(xs)
    from graphtyper_tpu.ops.discovery_pileup import aggregate_rows

    for x, c in zip(xs, batched):
        solo = aggregate_rows(
            x["r_ev"], x["r_dhq"], x["r_dlq"], x["r_bits"], x["r_mapq"],
            x["r_dist"], x["r_readpos"], len(x["ev_pos"]),
        )
        np.testing.assert_array_equal(solo, c)


def test_streamlined_discovery_rows_off_differential():
    """The production streamlined_discovery output is identical with the
    split path on (device_discovery=auto) and off (monolith)."""
    from dataclasses import replace

    from graphtyper_tpu.config import set_options
    from graphtyper_tpu.typer.discovery import streamlined_discovery

    tmp = tempfile.mkdtemp(prefix="gt_fp_rows_e2e_")
    cfg = SimConfig(region_length=80_000, coverage=25.0, n_samples=3, seed=11,
                    out_format="bam")
    sim = simulate_cohort(os.path.join(tmp, "m"), cfg)
    base = current_options()
    try:
        set_options(replace(base, device_discovery="auto"))
        v_on = streamlined_discovery(list(sim.sams), sim.fasta, f"{cfg.chrom}:1-80000")
        set_options(replace(base, device_discovery="off"))
        v_off = streamlined_discovery(list(sim.sams), sim.fasta, f"{cfg.chrom}:1-80000")
    finally:
        set_options(base)
    assert len(v_on.variants) == len(v_off.variants) > 0
    for a, b in zip(v_on.variants, v_off.variants):
        assert a.abs_pos == b.abs_pos and a.seqs == b.seqs and a.infos == b.infos
