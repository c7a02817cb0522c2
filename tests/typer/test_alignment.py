"""Alignment tests: synthetic reads sampled from fixture graph haplotypes."""

import numpy as np

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.typer.alignment import find_genotype_paths
from graphtyper_tpu.typer.genotype_paths import GenotypePaths
from graphtyper_tpu.utils.dna import encode


def _setup(data_dir, chrom, **kw):
    g = construct_graph(str(data_dir / "index_test.fa"), str(data_dir / "index_test.vcf.gz"), chrom, **kw)
    return g, index_graph(g)


def _align(graph, index, read: bytes) -> GenotypePaths:
    geno = GenotypePaths(0, len(read))
    find_genotype_paths(graph, index, encode(read), geno)
    return geno


def test_ref_read_full_alignment(data_dir):
    g, idx = _setup(data_dir, "chr1")
    ref = g.get_all_ref()
    read = ref[0:63]  # minimum read length, crosses the variant at 37
    geno = _align(g, idx, read)
    assert geno.longest_path_length == 63
    assert len(geno.paths) == 1
    p = geno.paths[0]
    assert p.mismatches == 0
    assert p.start == 1 and p.end == 63
    # read matches reference -> supports allele 0 at site order 37
    assert p.var_order == [37]
    assert p.nums == [{0}]


def test_alt_read_full_alignment(data_dir):
    g, idx = _setup(data_dir, "chr1")
    ref = g.get_all_ref()
    alt_hap = ref[:36] + b"G" + ref[37:]
    read = alt_hap[0:63]
    geno = _align(g, idx, read)
    assert geno.longest_path_length == 63
    p = geno.paths[0]
    assert p.mismatches == 0
    assert p.var_order == [37]
    assert p.nums == [{1}]


def test_mismatch_read_alignment(data_dir):
    g, idx = _setup(data_dir, "chr3")
    ref = g.get_all_ref()
    read = bytearray(ref[0:63])
    read[10] = ord("C")  # introduce one mismatch (ref is A-rich here)
    geno = _align(g, idx, bytes(read))
    assert geno.longest_path_length == 63
    assert geno.paths[0].mismatches >= 1
    assert geno.paths[0].var_order == [31]
    assert geno.paths[0].nums == [{0}]


def test_insertion_allele_read(data_dir):
    g, idx = _setup(data_dir, "chr3")
    ref = g.get_all_ref()
    # haplotype with 'GA' allele at site 31 (replacing ref 'A')
    hap = ref[:30] + b"GA" + ref[31:]
    read = hap[0:63]
    geno = _align(g, idx, read)
    assert geno.longest_path_length == 63
    p = geno.paths[0]
    assert p.mismatches == 0
    assert p.var_order == [31]
    assert p.nums == [{2}]


def test_read_not_in_graph(data_dir):
    g, idx = _setup(data_dir, "chr1")
    rng = np.random.default_rng(1)
    read = bytes(rng.choice(list(b"ACGT"), 70))
    geno = _align(g, idx, read)
    assert geno.longest_path_length < 63


def test_multiallelic_ref_read_supports_ref(data_dir):
    g, idx = _setup(data_dir, "chr2")
    ref = g.get_all_ref()
    read = ref[0:63]
    geno = _align(g, idx, read)
    p = geno.paths[0]
    assert p.mismatches == 0
    assert sorted(p.var_order) == [2, 3]
    assert all(0 in n for n in p.nums)
