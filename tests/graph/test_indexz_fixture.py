"""Constructor golden over the reference's indexz.vcf.gz fixture: variants
spread over chr1-chr4 of index_test.fa, including the rs4/rs5 overlapping
indel pair on chr3 that must merge into one multi-allelic site."""

import shutil

from graphtyper_tpu.graph.build import construct_graph

FIXTURE = "/root/reference/test/data/reference/indexz.vcf.gz"
FASTA = "/root/repo/tests/data/index_test.fa"


def _graph_for(tmp_path, chrom, end=100):
    # the bgzf fixture has no tabix index next to it we can write to; copy
    vcf = str(tmp_path / "indexz.vcf.gz")
    shutil.copyfile(FIXTURE, vcf)
    return construct_graph(FASTA, vcf, f"{chrom}:1-{end}", use_index=False)


def test_chr1_single_snp(tmp_path):
    g = _graph_for(tmp_path, "chr1")
    # one biallelic SNP at pos 37 (rs1 C>G)
    sites = g.genotypes()
    assert len(sites) == 1
    assert sites[0].num == 2
    assert g.var_nodes[sites[0].first_variant_node].label.order == 37


def test_chr2_adjacent_snps(tmp_path):
    g = _graph_for(tmp_path, "chr2")
    # rs2 (pos 2 C>A) and rs3 (pos 3 C>A) are adjacent but non-overlapping:
    # the default merge pass keeps true overlaps only
    sites = g.genotypes()
    assert len(sites) == 2
    assert [s.id for s in sites] == [2, 3]


def test_chr3_overlapping_indels_merge(tmp_path):
    g = _graph_for(tmp_path, "chr3")
    # rs5 (pos 9 ATAAAA>A, a deletion) overlaps rs4 (pos 10 T>TAAAA, an
    # insertion): the overlap merge folds them into one multi-allelic site
    sites = g.genotypes()
    assert len(sites) == 1
    assert sites[0].num >= 3  # ref + both alt paths survive


def test_chr4_snp(tmp_path):
    g = _graph_for(tmp_path, "chr4")
    sites = g.genotypes()
    assert len(sites) == 1
    assert g.var_nodes[sites[0].first_variant_node].label.order == 2
