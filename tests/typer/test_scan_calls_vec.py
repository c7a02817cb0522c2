"""scan_calls vectorized twin vs the scalar oracle: VarStats must match
field-for-field on randomized cohorts (variant.py _scan_calls_vectorized)."""

import copy

import numpy as np

from graphtyper_tpu.typer.sample_call import SampleCall
from graphtyper_tpu.typer.variant import Variant


def _random_variant(rng, n_alleles, n_samples, preset_filters=False):
    P = n_alleles * (n_alleles + 1) // 2
    v = Variant(abs_pos=1000, seqs=[b"A"] + [b"C" * (i + 1) for i in range(n_alleles - 1)])
    for s in range(n_samples):
        phred = rng.integers(0, 80, size=P).astype(np.int64)
        if rng.random() < 0.9:
            phred[rng.integers(0, P)] = 0  # usually at least one zero
        if rng.random() < 0.2:
            phred[rng.integers(0, P)] = 0  # sometimes two zeros -> GQ 0
        cov = rng.integers(0, 30, size=n_alleles).astype(np.int64)
        if rng.random() < 0.1:
            cov[:] = 0
        sc = SampleCall(
            phred=phred,
            coverage=cov,
            ambiguous_depth=int(rng.integers(0, 5)),
            alt_proper_pair_depth=int(rng.integers(0, 8)),
        )
        if preset_filters and rng.random() < 0.3:
            sc.filter = int(rng.integers(0, 4))
        v.calls.append(sc)
    return v


def _stats_tuple(v):
    st = v.stats
    pa = [
        (
            p.qd_qual, p.qd_depth, p.maximum_alt_support,
            round(p.maximum_alt_support_ratio, 12), p.n_alt_alt, p.n_ref_alt,
            p.n_ref_ref, tuple(p.het_multi_allele_depth),
            tuple(p.hom_multi_allele_depth), p.total_depth, p.ac, p.pass_ac,
        )
        for p in st.per_allele
    ]
    return (
        st.n_calls, st.n_max_alt_proper_pairs, st.n_genotyped,
        st.n_passed_calls, list(st.het_allele_depth), list(st.hom_allele_depth),
        st.seqdepth, pa,
    )


def test_scan_calls_vectorized_parity():
    rng = np.random.default_rng(0)
    for trial in range(40):
        n_alleles = int(rng.integers(2, 7))
        n_samples = int(rng.integers(8, 60))
        lr = bool(rng.integers(0, 2))
        v1 = _random_variant(rng, n_alleles, n_samples, preset_filters=trial % 3 == 0)
        v2 = copy.deepcopy(v1)

        # vectorized path (>= 8 calls triggers it)
        v1.scan_calls(is_lr_calling=lr)
        # scalar oracle: force the fallback
        v2._scan_calls_vectorized = lambda *a, **k: False
        v2.scan_calls(is_lr_calling=lr)

        assert _stats_tuple(v1) == _stats_tuple(v2), f"trial {trial}"
        # memoized per-sample filters must agree too (downstream FT field)
        assert [c.filter for c in v1.calls] == [c.filter for c in v2.calls]
