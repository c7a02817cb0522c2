"""Cross-path differential fuzzing.

For random workloads, the pipeline must produce byte-identical final VCFs
no matter which implementation path runs: native C++ vs Python oracles,
BAI-sliced vs full-scan input, streaming vs in-memory pooled caller,
native vs numpy SW, pooled region fan-out vs serial, 1 vs 4 threads, and
BAM vs CRAM vs SAM input encodings of the same reads.

Round-2's (uncommitted) version of this harness found 3 real bugs the unit
suite missed; this is the committed round-3 version. Run from the repo
root:  python tools/fuzz_diff.py [n_seeds]
"""

import gzip
import os
import sys
import tempfile
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.io.bai import ensure_bai
from graphtyper_tpu.pipeline.genotype import genotype
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort
from graphtyper_tpu.utils.simulate_indep import IndepConfig, simulate_indep


def vcf_text(path: str) -> list[str]:
    with gzip.open(path, "rt") as f:
        return [l for l in f if not l.startswith("##")]


def run(sim, region, out_dir, **opt_over):
    base = current_options()
    if opt_over:
        set_options(replace(base, **opt_over))
    try:
        return genotype(sim.fasta, sim.sams, region, out_dir)
    finally:
        set_options(base)


def bam_to_other(sim, fmt: str, out_dir: str):
    """Re-encode the cohort's BAMs as CRAM or SAM with identical records."""
    from graphtyper_tpu.io.bam import read_alignments
    from graphtyper_tpu.io.sam_writer import write_sam
    from graphtyper_tpu.io.cram_writer import write_cram

    out = []
    for i, p in enumerate(sim.sams):
        header, reads = read_alignments(p, parse_tags=True)
        dst = os.path.join(out_dir, f"re{i}.{fmt}")
        if fmt == "cram":
            write_cram(dst, header, reads)
        else:
            write_sam(dst, header, reads)
        out.append(dst)
    return out


def fuzz_seed(seed: int, tmp: str) -> list[str]:
    """Returns a list of failure descriptions for this seed."""
    fails = []
    rng_len = 30_000 + (seed * 7919) % 25_000
    if seed % 3 == 2:
        cfg = IndepConfig(region_length=rng_len, n_samples=1 + seed % 2, coverage=12.0, seed=seed)
        sim = simulate_indep(os.path.join(tmp, "sim"), cfg)
        chrom = cfg.chrom
    else:
        cfg = SimConfig(
            region_length=rng_len,
            n_samples=1 + seed % 3,
            coverage=10.0 + (seed % 3) * 4,
            seed=seed,
            out_format="bam",
        )
        sim = simulate_cohort(os.path.join(tmp, "sim"), cfg)
        chrom = cfg.chrom
    region = f"{chrom}:1-{rng_len}"

    ref_out = run(sim, region, os.path.join(tmp, "ref"))
    ref = vcf_text(ref_out)
    if len(ref) < 3:
        fails.append(f"seed {seed}: reference run produced {len(ref)} lines")
        return fails

    variants = {
        "python_caller": dict(native_caller="off"),
        "python_aligner": dict(native_aligner="off"),
        "stream_on": dict(streaming_caller="on"),
        "threads1": dict(threads=1),
        "threads4": dict(threads=4),
        "hq_reads": None,  # separate baseline: changes output legitimately
    }
    for name, over in variants.items():
        if over is None:
            continue
        try:
            out = run(sim, region, os.path.join(tmp, f"v_{name}"), **over)
            if vcf_text(out) != ref:
                fails.append(f"seed {seed}: {name} output differs")
        except Exception as e:
            fails.append(f"seed {seed}: {name} raised {e!r}")

    # numpy SW vs native SW
    from graphtyper_tpu.ops import sw as swmod

    saved = swmod._align_batch_native
    swmod._align_batch_native = lambda *a, **k: None
    try:
        out = run(sim, region, os.path.join(tmp, "v_numpy_sw"))
        if vcf_text(out) != ref:
            fails.append(f"seed {seed}: numpy-SW output differs")
    finally:
        swmod._align_batch_native = saved

    if all(p.endswith(".bam") for p in sim.sams):
        # BAI-sliced vs full-scan bamshrink
        for p in sim.sams:
            ensure_bai(p, min_size=0)
        out = run(sim, region, os.path.join(tmp, "v_bai"))
        if vcf_text(out) != ref:
            fails.append(f"seed {seed}: BAI-sliced output differs")
        for p in sim.sams:
            if os.path.exists(p + ".bai"):
                os.remove(p + ".bai")

        # python rANS vs native rANS through a CRAM re-encode
        cram_sams = bam_to_other(sim, "cram", tmp)
        from types import SimpleNamespace

        sim_cram = SimpleNamespace(fasta=sim.fasta, sams=cram_sams)
        out = run(sim_cram, region, os.path.join(tmp, "v_cram"))
        if vcf_text(out) != ref:
            fails.append(f"seed {seed}: CRAM-input output differs")
        from graphtyper_tpu.io import cram as crammod

        saved_rans = crammod._rans_decode_native
        crammod._rans_decode_native = lambda *a, **k: None
        try:
            out = run(sim_cram, region, os.path.join(tmp, "v_cram_pyrans"))
            if vcf_text(out) != ref:
                fails.append(f"seed {seed}: python-rANS CRAM output differs")
        finally:
            crammod._rans_decode_native = saved_rans

        sam_sams = bam_to_other(sim, "sam", tmp)
        sim_sam = SimpleNamespace(fasta=sim.fasta, sams=sam_sams)
        out = run(sim_sam, region, os.path.join(tmp, "v_sam"))
        if vcf_text(out) != ref:
            fails.append(f"seed {seed}: SAM-input output differs")

    # pooled region fan-out vs the serial loop (3 units)
    from graphtyper_tpu.pipeline.genotype import genotype_regions

    try:
        serial = genotype_regions(
            sim.fasta, sim.sams, region, os.path.join(tmp, "r_ser"),
            max_region_size=12_000, processes=1,
        )
        pooled = genotype_regions(
            sim.fasta, sim.sams, region, os.path.join(tmp, "r_pool"),
            max_region_size=12_000, processes=2,
        )
        for a, b in zip(serial, pooled):
            if vcf_text(a) != vcf_text(b):
                fails.append(f"seed {seed}: pooled regions differ at {os.path.basename(a)}")
    except Exception as e:
        fails.append(f"seed {seed}: region fan-out raised {e!r}")

    # --vcf mode determinism: two runs byte-identical (and CSI variant
    # produces the same records)
    from graphtyper_tpu.pipeline.genotype import genotype_only_with_a_vcf

    sites = os.path.join(tmp, "ref", "input_sites")
    site_files = []
    for root, _, files in os.walk(sites):
        site_files += [os.path.join(root, f) for f in files if f.endswith(".vcf.gz")]
    if site_files:
        try:
            o1 = genotype_only_with_a_vcf(
                sim.fasta, sim.sams, site_files[0], region, os.path.join(tmp, "gv1")
            )
            o2 = genotype_only_with_a_vcf(
                sim.fasta, sim.sams, site_files[0], region, os.path.join(tmp, "gv2")
            )
            if vcf_text(o1) != vcf_text(o2):
                fails.append(f"seed {seed}: --vcf mode nondeterministic")
        except Exception as e:
            fails.append(f"seed {seed}: --vcf mode raised {e!r}")

    # popVCF final encoding must decode back to the plain output
    try:
        out_pop = run(sim, region, os.path.join(tmp, "v_pop"), encoding="p")
        from graphtyper_tpu.io.popvcf import decode_file

        dec = os.path.join(tmp, "pop_decoded.vcf.gz")
        decode_file(out_pop, dec)
        if vcf_text(dec) != ref:
            fails.append(f"seed {seed}: popVCF roundtrip differs")
    except Exception as e:
        fails.append(f"seed {seed}: popVCF raised {e!r}")

    return fails


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    all_fails = []
    t0 = time.time()
    for seed in range(n):
        with tempfile.TemporaryDirectory(prefix="gt_fuzz_") as tmp:
            fails = fuzz_seed(seed, tmp)
            status = "OK" if not fails else "; ".join(fails)
            print(f"[{time.time()-t0:6.1f}s] seed {seed}: {status}", flush=True)
            all_fails.extend(fails)
    if all_fails:
        print(f"\nFUZZ FAILURES ({len(all_fails)}):")
        for f in all_fails:
            print(" ", f)
        sys.exit(1)
    print(f"\nall {n} seeds clean")


if __name__ == "__main__":
    main()
