"""--uncompressed_sample_names (vcf.cpp:700-749): the sample-name span of
the #CHROM header line lands in standalone 0-level BGZF blocks whose byte
range is written to <prefix>.samples_byte_range — external tools can patch
sample names in place without re-encoding. The file must stay a valid BGZF
VCF with a working tabix index."""

import gzip
import os
from dataclasses import replace

from graphtyper_tpu.config import current_options, set_options
from graphtyper_tpu.io.bgzf import decompress_all
from graphtyper_tpu.pipeline.genotype import genotype
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def test_uncompressed_sample_names(tmp_path):
    cfg = SimConfig(region_length=15_000, coverage=18.0, seed=7, n_samples=2, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "c"), cfg)
    old = current_options()
    try:
        set_options(replace(old, uncompressed_sample_names=True))
        out = genotype(sim.fasta, sim.sams, f"{cfg.chrom}:1-15000", str(tmp_path / "out"))
    finally:
        set_options(old)

    # normal consumers see a regular VCF
    text = decompress_all(out).decode()
    assert text == gzip.open(out, "rt").read()
    chrom_line = [l for l in text.splitlines() if l.startswith("#CHROM")][0]
    names = chrom_line.split("\t")[9:]
    assert len(names) == 2

    # the byte-range sidecar brackets a standalone BGZF stream holding
    # exactly the sample-name span
    br = out[: -len(".vcf.gz")] + ".samples_byte_range"
    assert os.path.exists(br), br
    begin, end = (int(x) for x in open(br).read().split())
    raw = open(out, "rb").read()
    segment = raw[begin - 1 : end]
    from graphtyper_tpu.io.bgzf import BGZF_EOF

    seg_text = gzip.decompress(segment + BGZF_EOF).decode()
    assert seg_text == "\t".join(names) + "\n"
    # 0-level deflate: stored blocks are at least as large as the payload
    assert len(segment) >= len(seg_text)

    # tabix voffsets survive the block boundary: region reads still work
    from graphtyper_tpu.io.tabix import read_region_lines

    body = [l for l in text.splitlines() if not l.startswith("#")]
    pos0 = int(body[0].split("\t")[1])
    lines = read_region_lines(out, out + ".tbi", cfg.chrom, pos0 - 1, pos0 + 1)
    assert any(l.split("\t")[1] == str(pos0) for l in lines)
