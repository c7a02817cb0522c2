"""Genotyping pipeline orchestrators.

Reference semantics: src/utilities/genotype.cpp — genotype_only_with_a_vcf
(:262-334, single iteration when --vcf is given), genotype (:336-681, the
3-iteration discovery/regenotyping loop), genotype_regions (:683-741);
src/utilities/genotype_sv.cpp (:26-180, single-iteration SV pipeline).
"""

from __future__ import annotations

import os

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.graph.coords import GenomicRegion, split_region
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.pipeline.caller import call_pool
from graphtyper_tpu.pipeline.vcf_operations import vcf_merge_and_break, vcf_merge_and_filter


def genotype_only_with_a_vcf(
    ref_path: str,
    sams: list[str],
    vcf_path: str,
    region_str: str,
    output_dir: str,
    avg_cov_by_readlen: list[float] | None = None,
) -> str:
    """Single-iteration genotyping from a known-variants VCF
    (genotype.cpp:262-334). Returns the output VCF path."""
    region = GenomicRegion.parse(region_str)
    padded = GenomicRegion(region.chr, region.begin, region.end)
    padded.pad(1000)

    os.makedirs(output_dir, exist_ok=True)
    graph = construct_graph(ref_path, vcf_path, padded.to_string(), is_sv_graph=False, use_index=True)
    index = index_graph(graph)

    result = call_pool(
        graph,
        index,
        sams,
        region=padded,
        avg_cov_by_readlen=avg_cov_by_readlen,
        is_writing_calls_vcf=True,
        is_writing_hap=False,
    )

    out_path = os.path.join(output_dir, "graphtyper.vcf.gz")
    vcf_merge_and_break(
        [result.vcf],
        out_path,
        region.to_string(),
        graph,
        filter_zero_qual=False,
    )
    return out_path


def genotype_sv(
    ref_path: str,
    sv_vcf: str,
    sams: list[str],
    region_str: str,
    output_dir: str,
    avg_cov_by_readlen: list[float] | None = None,
) -> str:
    """Single-iteration SV genotyping (genotype_sv.cpp:26-180)."""
    region = GenomicRegion.parse(region_str)
    padded = GenomicRegion(region.chr, region.begin, region.end)
    padded.pad_end(200000)
    padded.pad(1000)

    os.makedirs(output_dir, exist_ok=True)
    graph = construct_graph(ref_path, sv_vcf, padded.to_string(), is_sv_graph=True, use_index=True)
    index = index_graph(graph)

    result = call_pool(
        graph,
        index,
        sams,
        region=padded,
        avg_cov_by_readlen=avg_cov_by_readlen,
        is_writing_calls_vcf=True,
        is_writing_hap=False,
    )

    out_path = os.path.join(output_dir, "graphtyper.sv.vcf.gz")
    vcf_merge_and_break(
        [result.vcf],
        out_path,
        region.to_string(),
        graph,
        filter_zero_qual=True,
        force_no_break_down=True,  # SVs are not decomposed
    )
    return out_path
