"""Differential test: the native batched variant finisher
(native/gt_variant.cpp via typer/native_finisher.py) must produce
byte-identical VCF record columns and identical is_good_alt verdicts to the
Python path (typer/variant.py generate_infos + typer/vcf_out.py
format_record) over randomized variants — fresh-scan and pre-scanned,
stats-bearing and stats-free, with SNP/indel/mixed/star alleles."""

import copy

import numpy as np
import pytest

from graphtyper_tpu.graph.coords import AbsolutePosition, Contig
from graphtyper_tpu.models.genotype_model import ReadStrand, VarStats, VarStatsPerAllele
from graphtyper_tpu.typer import native_finisher
from graphtyper_tpu.typer.sample_call import SampleCall
from graphtyper_tpu.typer.variant import Variant
from graphtyper_tpu.typer.vcf_out import VcfOutput

pytestmark = pytest.mark.skipif(
    not native_finisher.available(), reason="native library unavailable"
)


def _random_variant(rng: np.random.Generator, S: int) -> Variant:
    A = int(rng.integers(1, 6))
    P = A * (A + 1) // 2
    bases = [b"A", b"C", b"G", b"T"]
    kind = rng.integers(0, 4)
    seqs = []
    for a in range(A):
        if kind == 0:  # SNPs
            seqs.append(bases[int(rng.integers(0, 4))])
        elif kind == 1:  # indel-ish: ragged lengths
            L = int(rng.integers(1, 8))
            seqs.append(bytes(bases[int(rng.integers(0, 4))][0] for _ in range(L)))
        elif kind == 2:  # mixed with star
            if a == A - 1 and A > 1 and rng.random() < 0.5:
                seqs.append(b"*")
            else:
                L = int(rng.integers(1, 5))
                seqs.append(bytes(bases[int(rng.integers(0, 4))][0] for _ in range(L)))
        else:  # occasionally long
            L = int(rng.integers(1, 60))
            seqs.append(bytes(bases[int(rng.integers(0, 4))][0] for _ in range(L)))
    var = Variant(abs_pos=int(rng.integers(1, 5000)), seqs=seqs)

    for _ in range(S):
        phred = rng.integers(0, 255, size=P).astype(np.int64)
        if rng.random() < 0.9:
            phred[int(rng.integers(0, P))] = 0  # usually a called genotype
        if rng.random() < 0.2:
            phred[:] = 0  # no-coverage call
        cov = rng.integers(0, 30, size=A).astype(np.int64)
        call = SampleCall(
            phred=phred,
            coverage=cov,
            ambiguous_depth=int(rng.integers(0, 5)),
            alt_proper_pair_depth=int(rng.integers(0, 9)),
        )
        if rng.random() < 0.3:
            call.filter = int(rng.integers(0, 4))  # preset memo
        var.calls.append(call)

    r = rng.random()
    if r < 0.45:
        pass  # no stats: fresh sizing + scan inside generate_infos
    else:
        st = VarStats.sized(A)
        var.stats = st
        for pa in st.per_allele:
            pa.clipped_bp = int(rng.integers(0, 200))
            pa.mapq_squared = int(rng.integers(0, 3600 * 50))
            pa.score_diff = int(rng.integers(0, 500))
            pa.mismatches = int(rng.integers(0, 900))
        for rs in st.read_strand:
            rs.r1_forward = int(rng.integers(0, 30))
            rs.r1_reverse = int(rng.integers(0, 30))
            rs.r2_forward = int(rng.integers(0, 30))
            rs.r2_reverse = int(rng.integers(0, 30))
        st.clipped_reads = int(rng.integers(0, 60))
        st.mapq_squared = int(rng.integers(0, 3600 * 200))
        if r < 0.65 and S > 0:
            # pre-scanned state: run the Python scan on this exact object
            var.scan_calls()
    return var


def test_differential_vs_python():
    rng = np.random.default_rng(1234)
    abs_pos = AbsolutePosition([Contig("chrT", 100000)])
    for S in (0, 1, 2, 5):
        variants = [_random_variant(rng, S) for _ in range(120)]
        py_vars = copy.deepcopy(variants)

        ok = native_finisher.finish_variants(variants, S, want_strings=True)
        assert ok

        out_py = VcfOutput(sample_names=[f"s{i}" for i in range(S)])
        out_nat = VcfOutput(sample_names=[f"s{i}" for i in range(S)])
        n_checked = 0
        for v_nat, v_py in zip(variants, py_vars):
            fin = getattr(v_nat, "_fin", None)
            assert fin is not None, "eligible variant skipped by the finisher"
            good_py = v_py.generate_infos(None, is_sv_graph=False)
            assert fin[0] == good_py, (v_py.seqs, v_py.infos)
            line_py = out_py.format_record(v_py, abs_pos, filter_zero_qual=False)
            line_nat = out_nat.format_record(v_nat, abs_pos, filter_zero_qual=False)
            assert line_nat == line_py, f"\nPY : {line_py}\nNAT: {line_nat}"
            n_checked += 1
        assert n_checked == 120


def test_want_strings_false_only_good():
    rng = np.random.default_rng(7)
    variants = [_random_variant(rng, 2) for _ in range(40)]
    py_vars = copy.deepcopy(variants)
    assert native_finisher.finish_variants(variants, 2, want_strings=False)
    for v_nat, v_py in zip(variants, py_vars):
        fin = v_nat._fin
        assert fin[0] == v_py.generate_infos(None, is_sv_graph=False)
        assert fin[3] == ""  # no INFO string requested


def test_ineligible_variants_untouched():
    v = Variant(abs_pos=100, seqs=[b"A", b"<DEL:SVSIZE=99>AAAA"])
    assert native_finisher.finish_variants([v], 0)
    assert not hasattr(v, "_fin")  # SV alleles stay on the Python path


def test_scan_writeback():
    """scan_variants must leave every stats field and filter memo exactly as
    Variant.scan_calls would (the pool-save scan)."""
    from dataclasses import asdict

    rng = np.random.default_rng(99)
    for S in (1, 3, 6):
        variants = [_random_variant(rng, S) for _ in range(80)]
        py_vars = copy.deepcopy(variants)
        rest = native_finisher.scan_variants(variants, S)
        assert not rest, "all random variants should be scan-eligible"
        for v_nat, v_py in zip(variants, py_vars):
            v_py.scan_calls()
            assert asdict(v_nat.stats) == asdict(v_py.stats), (v_py.seqs,)
            for c_nat, c_py in zip(v_nat.calls, v_py.calls):
                assert c_nat.filter == c_py.filter
