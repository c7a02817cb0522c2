"""BAI (BAM index) build/query parity (io/bai.py).

The htslib-iterator analog: region reads through the index must yield a
record set that, after the consumers' own position filters, is identical to
a full-file scan. bamshrink is the production consumer (reference:
bamshrink.cpp iterates sam_itr_querys over the padded region).
"""

import os
import struct

import numpy as np
import pytest

from graphtyper_tpu.io.bai import (
    Bai,
    build_bai,
    ensure_bai,
    read_bai,
    read_region_bam_bytes,
    reg2bin,
    reg2bins,
    region_chunks,
)
from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort


def test_reg2bin_spec_values():
    # leaf level: 16kb windows start at bin 4681
    assert reg2bin(0, 1) == 4681
    assert reg2bin(16384, 16385) == 4682
    # spanning two leaves promotes a level
    assert reg2bin(16000, 17000) == 585
    assert 4681 in reg2bins(0, 1)
    assert 0 in reg2bins(0, 1)


@pytest.fixture(scope="module")
def sim_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("bai")
    cfg = SimConfig(region_length=300_000, coverage=8.0, seed=21, out_format="bam")
    sim = simulate_cohort(str(d / "sim"), cfg)
    return sim.sams[0], cfg.chrom


def _record_names(bam_bytes):
    names = []
    (l_text,) = struct.unpack_from("<i", bam_bytes, 4)
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", bam_bytes, off)
    off += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", bam_bytes, off)
        off += 4 + l_name + 4
    while off + 4 <= len(bam_bytes):
        (bs,) = struct.unpack_from("<i", bam_bytes, off)
        pos = struct.unpack_from("<i", bam_bytes, off + 8)[0]
        l_read_name = bam_bytes[off + 12]
        name = bam_bytes[off + 36 : off + 36 + l_read_name - 1].decode()
        names.append((pos, name))
        off += 4 + bs
    return names


def test_build_query_roundtrip(sim_bam, tmp_path):
    bam, chrom = sim_bam
    bai_path = build_bai(bam, str(tmp_path / "x.bai"))
    bai = read_bai(bai_path)
    assert isinstance(bai, Bai)

    from graphtyper_tpu.io.bgzf import decompress_all

    full = decompress_all(bam)
    all_names = _record_names(full)

    for beg, end in [(0, 50_000), (123_000, 171_000), (250_000, 300_000), (299_000, 300_500)]:
        sliced = read_region_bam_bytes(bam, [(chrom, beg, end)], bai_path)
        assert sliced is not None
        got = set(_record_names(sliced))
        # every record whose start lies in the window must be present
        want = {(p, n) for p, n in all_names if beg <= p < end}
        assert want <= got
        # and the slice is materially smaller than the file for interior windows
        if end - beg <= 60_000:
            assert len(sliced) < len(full) * 0.55


def test_ensure_bai_and_bamshrink_slice_parity(sim_bam, tmp_path):
    bam, chrom = sim_bam
    assert ensure_bai(bam, min_size=0)
    assert os.path.exists(bam + ".bai")

    from graphtyper_tpu.pipeline.bamshrink import bamshrink

    out_idx = str(tmp_path / "idx.bam")
    bamshrink(bam, chrom, 120_000, 170_000, out_idx)

    # hide the index -> full-scan path; outputs must be byte-identical
    os.rename(bam + ".bai", bam + ".bai.hidden")
    try:
        out_full = str(tmp_path / "full.bam")
        bamshrink(bam, chrom, 120_000, 170_000, out_full)
    finally:
        os.rename(bam + ".bai.hidden", bam + ".bai")
    with open(out_idx, "rb") as a, open(out_full, "rb") as b:
        assert a.read() == b.read()


def test_stale_index_ignored(sim_bam, tmp_path):
    bam, chrom = sim_bam
    ensure_bai(bam, min_size=0)
    past = os.path.getmtime(bam) - 100
    os.utime(bam + ".bai", (past, past))
    assert read_region_bam_bytes(bam, [(chrom, 0, 1000)]) is None
    assert ensure_bai(bam, min_size=0)  # rebuilds
    assert read_region_bam_bytes(bam, [(chrom, 0, 1000)]) is not None
