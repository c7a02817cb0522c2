"""Vectorized LR pileup vs the scalar oracle: identical counts/qualsums on
messy long reads — soft clips, insertions/deletions in CIGAR, reads hanging
off both window edges, zero/low quals, ambiguous bases, MAPQ/flag gates,
and a small coverage cap whose skip threshold must replay exactly."""

import numpy as np

from graphtyper_tpu.config import Options
from graphtyper_tpu.io.bam import AlignedRead
from graphtyper_tpu.typer.discovery_lr import lr_pileup, lr_pileup_scalar


def _mk_reads(rng, ref_size, region_begin, n_reads):
    BASES = np.frombuffer(b"ACGTN", dtype=np.uint8)
    reads = []
    for i in range(n_reads):
        rl = int(rng.integers(120, 2200))  # some below the 150bp gate
        seq = BASES[rng.integers(0, 5, rl)].tobytes()
        qual = rng.integers(0, 60, rl).astype(np.uint8)  # zeros included
        pos = int(rng.integers(-300, ref_size + 100)) + region_begin
        mapq = int(rng.choice([0, 5, 10, 30, 60]))
        flag = int(rng.choice([0, 16, 1024]))
        # random cigar consuming exactly rl query bases
        cigar = []
        left = rl
        if rng.random() < 0.3:
            c = int(rng.integers(1, 30))
            cigar.append((4, c))
            left -= c
        while left > 0:
            kind = int(rng.choice([0, 1, 2], p=[0.7, 0.15, 0.15]))
            if kind == 0:
                n = int(rng.integers(1, min(left, 900) + 1))
                cigar.append((0, n))
                left -= n
            elif kind == 1 and left > 1:
                n = int(rng.integers(1, min(left - 1, 20) + 1))
                cigar.append((1, n))
                left -= n
            else:
                cigar.append((2, int(rng.integers(1, 30))))
        reads.append(AlignedRead(name=f"r{i}", flag=flag, ref_id=0, pos=pos, mapq=mapq,
                                 cigar=cigar, mate_ref_id=-1, mate_pos=-1, tlen=0,
                                 seq=seq, qual=qual, tags={}))
    reads.sort(key=lambda r: r.pos)
    return reads


def test_lr_pileup_vectorized_matches_scalar():
    rng = np.random.default_rng(17)
    region_begin = 1000
    ref_size = 5000
    for trial in range(6):
        reads = _mk_reads(rng, ref_size, region_begin, 120)
        for cov_filter in (0, 7):
            opts = Options(lr_coverage_filter=cov_filter)
            c1, q1 = lr_pileup(reads, region_begin, ref_size, opts)
            c2, q2 = lr_pileup_scalar(reads, region_begin, ref_size, opts)
            assert (c1 == c2).all(), (trial, cov_filter)
            assert (q1 == q2).all(), (trial, cov_filter)
