"""Randomized differential: the flat-array chain builder (_build_flat) vs
the legacy node-object loop (_add_reference/_add_variants) on fuzzed VCF
record sets — overlapping records, multi-allelics, indels, adjacent sites,
GT_ID/anti events. Both run the identical merge preprocessing inside
add_genomic_region; the resulting graphs must match node-for-node."""

import random

import numpy as np
import pytest

from graphtyper_tpu.graph import build as build_mod
from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.graph.graph import Graph, GraphFlat
from graphtyper_tpu.io.vcf_io import VcfTextRecord


class LegacyGraph(Graph):
    """Graph whose chain build uses the pre-flat node-object loop."""

    def _build_flat(self, reference_sequence, var_records, region):
        for rec in var_records:
            self._add_reference(rec.pos, len(rec.alts) + 1, reference_sequence)
            self._add_variants(rec)
        self._add_reference(len(reference_sequence) + region.begin, 0, reference_sequence)


def _rand_records(rng: random.Random, ref: bytes, chrom: str, n: int):
    recs = []
    pos = rng.randint(1, 40)
    for _ in range(n):
        if pos >= len(ref) - 20:
            break
        ref_len = rng.choice([1, 1, 1, 2, 3, rng.randint(4, 10)])
        ref_seq = ref[pos : pos + ref_len].decode()
        alts = set()
        for _ in range(rng.randint(1, 3)):
            kind = rng.random()
            if kind < 0.5:  # SNP-ish: same length
                alts.add("".join(rng.choice("ACGT") for _ in range(ref_len)))
            elif kind < 0.75:  # insertion
                alts.add(ref_seq + "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6))))
            else:  # deletion (needs ref_len > 1 to differ)
                alts.add(ref_seq[: max(1, ref_len - rng.randint(1, ref_len))])
        alts.discard(ref_seq)
        if alts:
            info = "."
            if rng.random() < 0.3:
                info = f"GT_ID={rng.randint(1, 9)}"
                if rng.random() < 0.5:
                    info += f";GT_ANTI_HAPLOTYPE={rng.randint(1, 9)}"
            recs.append(
                VcfTextRecord(
                    chrom=chrom, pos=pos, id=".", ref=ref_seq,
                    alts=sorted(alts), info=info,
                )
            )
        # sometimes overlap / sit adjacent to the previous record
        step = rng.choice([0, 1, 2, ref_len, ref_len + rng.randint(0, 12)])
        pos += max(1, step)
    return recs


def test_flat_builder_matches_legacy_sv_fixture(data_dir, monkeypatch):
    """SV graphs (tagged var nodes, breakpoint records) through the same
    flat-vs-legacy differential, on the reference's index_test chr5/chr6
    SV fixtures."""
    fa = str(data_dir / "index_test.fa")
    vcf = str(data_dir / "index_test.vcf.gz")
    for chrom in ("chr5", "chr6"):
        g_flat = construct_graph(fa, vcf, chrom, is_sv_graph=True)
        assert g_flat._ref_nodes is None
        monkeypatch.setattr(build_mod, "Graph", LegacyGraph)
        g_legacy = construct_graph(fa, vcf, chrom, is_sv_graph=True)
        monkeypatch.setattr(build_mod, "Graph", Graph)
        a, b = g_flat.flat(), GraphFlat.from_nodes(g_legacy)
        assert a.ref_bytes == b.ref_bytes and a.var_bytes == b.var_bytes
        for name in ("ref_order", "ref_var_first", "var_order", "var_out_ref",
                     "var_dna_len", "ev_off", "ev_vals", "anti_off", "anti_vals"):
            np.testing.assert_array_equal(getattr(a, name), getattr(b, name), err_msg=f"{chrom} {name}")
        np.testing.assert_array_equal(a.sp_ref_reach, np.asarray(g_legacy.ref_reach_poses))
        np.testing.assert_array_equal(a.sp_actual, np.asarray(g_legacy.actual_poses))
        assert g_flat.check() and g_legacy.check()


@pytest.mark.parametrize("seed", range(25))
def test_flat_builder_matches_legacy_nodes(tmp_path, seed, monkeypatch):
    rng = random.Random(seed)
    ref = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(300, 2500)))
    chrom = "chrF"
    fa = tmp_path / "f.fa"
    fa.write_bytes(b">" + chrom.encode() + b"\n" + ref + b"\n")
    # .fai sidecar
    (tmp_path / "f.fa.fai").write_text(f"{chrom}\t{len(ref)}\t{len(chrom) + 2}\t{len(ref)}\t{len(ref) + 1}\n")
    recs = _rand_records(rng, ref, chrom, rng.randint(1, 60))
    add_all = rng.random() < 0.5

    g_flat = construct_graph(str(fa), "", chrom, records=recs, add_all_variants=add_all)
    assert g_flat._ref_nodes is None  # flat path actually ran

    monkeypatch.setattr(build_mod, "Graph", LegacyGraph)
    g_legacy = construct_graph(str(fa), "", chrom, records=recs, add_all_variants=add_all)
    assert isinstance(g_legacy, LegacyGraph)
    assert g_legacy._ref_nodes is not None  # legacy path actually ran

    a = g_flat.flat()
    b = GraphFlat.from_nodes(g_legacy)
    assert a.ref_bytes == b.ref_bytes
    assert a.var_bytes == b.var_bytes
    for name in (
        "ref_order", "ref_dna_start", "ref_dna_len", "ref_var_first",
        "var_order", "var_dna_start", "var_dna_len", "var_out_ref",
        "ev_off", "ev_vals", "anti_off", "anti_vals",
    ):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name), err_msg=f"seed={seed} {name}")
    np.testing.assert_array_equal(a.sp_ref_reach, np.asarray(g_legacy.ref_reach_poses))
    np.testing.assert_array_equal(a.sp_actual, np.asarray(g_legacy.actual_poses))
    # variant_num sequences agree after materialization
    assert [vn.label.variant_num for vn in g_flat.var_nodes] == [
        vn.label.variant_num for vn in g_legacy.var_nodes
    ]
