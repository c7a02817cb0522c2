"""Golden port of reference test/typer/test_vcf.cpp: building a Vcf from
scored haplotype sites on the chr2 fixture graph."""

import pathlib

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.models.genotype_model import HaplotypeSite
from graphtyper_tpu.typer.vcf_out import VcfOutput

DATA = pathlib.Path(__file__).resolve().parents[1] / "data"


def test_create_vcf_and_add_samples():
    vcf = VcfOutput()
    assert vcf.sample_names == []
    vcf.sample_names.append("TEST_SAMP1")
    assert vcf.sample_names == ["TEST_SAMP1"]
    vcf.sample_names.append("TEST_SAMP2")
    assert vcf.sample_names == ["TEST_SAMP1", "TEST_SAMP2"]


def test_create_vcf_and_add_variants():
    # test_vcf.cpp "Create a VCF and add variants" on the chr2 fixture
    g = construct_graph(str(DATA / "index_test.fa"), str(DATA / "index_test.vcf.gz"), "chr2")
    sites = list(g.genotypes())
    assert len(sites) == 2
    vcf = VcfOutput(sample_names=[])
    assert vcf.variants == []
    for s in sites:
        vcf.add_haplotype(HaplotypeSite(s), phase_set=s.id, graph=g)
    assert len(vcf.variants) == 2
    assert vcf.variants[0].seqs == [b"C", b"A"]
    assert vcf.variants[1].seqs == [b"C", b"A"]
