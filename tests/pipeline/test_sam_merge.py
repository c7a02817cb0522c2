"""sam_merge tests: chunked multi-sample BAM merging
(hts_parallel_reader.cpp:1224, genotype.cpp:174-260) and RG-based sample
resolution in the pool reader."""

from types import SimpleNamespace

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.io.bam import read_alignments
from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf
from graphtyper_tpu.pipeline.sam_merge import run_sam_merge, sam_merge

from tests.pipeline.test_genotype_e2e import _read_vcf_gz, simulate_sam


def _two_samples(data_dir, tmp_path):
    fa = str(data_dir / "index_test.fa")
    vcf = str(data_dir / "index_test.vcf.gz")
    g = construct_graph(fa, vcf, "chr1")
    ref = g.get_all_ref()
    alt = ref[:36] + b"G" + ref[37:]
    s1 = tmp_path / "s1.sam"
    s2 = tmp_path / "s2.sam"
    simulate_sam(s1, "chr1", 66, [ref, alt], n_pairs=30, sample="sampleA", seed=1)
    simulate_sam(s2, "chr1", 66, [alt, alt], n_pairs=30, sample="sampleB", seed=2)
    return fa, vcf, str(s1), str(s2)


def test_sam_merge_preserves_samples_and_order(data_dir, tmp_path):
    fa, vcf, s1, s2 = _two_samples(data_dir, tmp_path)
    merged = str(tmp_path / "merged.bam")
    sam_merge(merged, [s1, s2], remove_inputs=False)
    header, reads = read_alignments(merged, parse_tags=True)
    assert header.sample_names == ["sampleA", "sampleB"]
    assert len(reads) == 120
    # coordinate order maintained
    positions = [r.pos for r in reads]
    assert positions == sorted(positions)
    # every read resolves to a sample through its RG tag
    samples = {header.rg_to_sample[r.tags["RG"]] for r in reads}
    assert samples == {"sampleA", "sampleB"}


def test_genotype_from_merged_matches_unmerged(data_dir, tmp_path):
    fa, vcf, s1, s2 = _two_samples(data_dir, tmp_path)
    out1 = genotype_only_with_a_vcf(fa, [s1, s2], vcf, "chr1", str(tmp_path / "out_sep"))
    merged = str(tmp_path / "merged.bam")
    sam_merge(merged, [s1, s2], remove_inputs=False)
    out2 = genotype_only_with_a_vcf(fa, [merged], vcf, "chr1", str(tmp_path / "out_mrg"))
    h1, b1 = _read_vcf_gz(out1)
    h2, b2 = _read_vcf_gz(out2)
    assert h1[-1].split("\t")[9:] == ["sampleA", "sampleB"]
    assert h2[-1].split("\t")[9:] == ["sampleA", "sampleB"]
    assert b1 == b2  # identical records incl. per-sample calls


def test_run_sam_merge_policy(tmp_path, data_dir):
    fa, vcf, s1, s2 = _two_samples(data_dir, tmp_path)
    # below the 200-samples-per-thread threshold: no merging
    opts = SimpleNamespace(is_sam_merging_allowed=True, max_files_open=864, threads=1)
    assert run_sam_merge([s1, s2], str(tmp_path), opts) == [s1, s2]
    # forced: 2 files, threshold satisfied with tiny knobs
    opts = SimpleNamespace(is_sam_merging_allowed=True, max_files_open=864, threads=1)
    many = [s1, s2] * 150  # 300 entries -> chunk = min(10, 300/1/100) = 3
    out = run_sam_merge(many, str(tmp_path), opts)
    assert len(out) == 100
    assert all(p.endswith(".bam") for p in out)
    # merging disabled
    opts = SimpleNamespace(is_sam_merging_allowed=False, max_files_open=864, threads=1)
    assert run_sam_merge(many, str(tmp_path), opts) == many
