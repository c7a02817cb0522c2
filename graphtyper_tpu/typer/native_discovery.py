"""ctypes wrapper for the native discovery first pass (gt_first_pass):
the per-sample CIGAR pileup, SNP/indel support gates, and phase analysis
run in C++ on BAM bytes; the surviving events are rebuilt as the Python
Event/EventSupport structures the rest of discovery consumes.

Event-level parity with typer/discovery.run_first_pass is asserted by
tests/pipeline/test_native_first_pass.py.
"""

from __future__ import annotations

import ctypes

import numpy as np

from graphtyper_tpu.io.native import get_lib

_p64 = ctypes.POINTER(ctypes.c_int64)


def _setup(lib) -> None:
    if getattr(lib, "_fp_ready", False):
        return
    lib.gt_first_pass.restype = ctypes.c_void_p
    lib.gt_first_pass.argtypes = (
        [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
         ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        + [_p64] * 6
    )
    lib.gt_first_pass_fetch.restype = ctypes.c_int32
    lib.gt_first_pass_fetch.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 17
    lib.gt_first_pass_free.restype = None
    lib.gt_first_pass_free.argtypes = [ctypes.c_void_p]
    lib._fp_ready = True


def available() -> bool:
    return get_lib() is not None


def run_first_pass_native(bam_bytes: bytes, target_ref: int, region_begin: int, reference: bytes, opts):
    """Returns (buckets, sample_haplotypes) like discovery.run_first_pass, or
    None to fall back."""
    lib = get_lib()
    if lib is None:
        return None
    _setup(lib)
    from graphtyper_tpu.typer.discovery import BUCKET_SIZE, BucketFirstPass, HaplotypeInfo
    from graphtyper_tpu.typer.events import Event, EventSupport

    opt_ints = np.array(
        [
            1 if getattr(opts, "filter_on_proper_pairs", True) else 0,
            1 if getattr(opts, "no_filter_on_begin_pos", False) else 0,
            1 if getattr(opts, "filter_on_read_bias", True) else 0,
            1 if getattr(opts, "filter_on_strand_bias", True) else 0,
        ],
        dtype=np.int64,
    )
    data = np.frombuffer(bam_bytes, dtype=np.uint8)
    ref = np.frombuffer(reference, dtype=np.uint8)
    n_events = ctypes.c_int64()
    n_seq = ctypes.c_int64()
    n_ever = ctypes.c_int64()
    n_always = ctypes.c_int64()
    n_phase = ctypes.c_int64()
    n_buckets = ctypes.c_int64()

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    handle = lib.gt_first_pass(
        ptr(data), len(bam_bytes), target_ref, region_begin,
        ptr(ref), len(reference), ptr(opt_ints),
        ctypes.byref(n_events), ctypes.byref(n_seq), ctypes.byref(n_ever),
        ctypes.byref(n_always), ctypes.byref(n_phase), ctypes.byref(n_buckets),
    )
    try:
        N = n_events.value
        pos = np.zeros(N, dtype=np.int64)
        typ = np.zeros(N, dtype=np.uint8)
        seq = np.zeros(n_seq.value, dtype=np.uint8)
        seq_off = np.zeros(N + 1, dtype=np.int64)
        counts = np.zeros(N * 11, dtype=np.int64)
        span = np.zeros(N, dtype=np.int64)
        maxlq = np.zeros(N, dtype=np.int64)
        in_bucket = np.zeros(N, dtype=np.uint8)
        has_good = np.zeros(N, dtype=np.uint8)
        has_realn = np.zeros(N, dtype=np.uint8)
        ever = np.zeros(n_ever.value, dtype=np.int64)
        ever_off = np.zeros(N + 1, dtype=np.int64)
        always = np.zeros(n_always.value, dtype=np.int64)
        always_off = np.zeros(N + 1, dtype=np.int64)
        phase_idx = np.zeros(n_phase.value, dtype=np.int64)
        phase_cnt = np.zeros(n_phase.value, dtype=np.int64)
        phase_off = np.zeros(N + 1, dtype=np.int64)
        rc = lib.gt_first_pass_fetch(
            handle,
            ptr(pos), ptr(typ), ptr(seq), ptr(seq_off),
            ptr(counts), ptr(span), ptr(maxlq),
            ptr(in_bucket), ptr(has_good), ptr(has_realn),
            ptr(ever), ptr(ever_off), ptr(always), ptr(always_off),
            ptr(phase_idx), ptr(phase_cnt), ptr(phase_off),
        )
        if rc != 0:
            return None
    finally:
        lib.gt_first_pass_free(handle)

    type_chars = ("I", "D", "X")
    seq_b = seq.tobytes()
    events: list[Event] = []
    infos: list[EventSupport] = []
    c = counts.reshape(N, 11)
    for i in range(N):
        ev = Event(int(pos[i]), type_chars[typ[i]], seq_b[seq_off[i] : seq_off[i + 1]])
        info = EventSupport(
            hq_count=int(c[i, 0]),
            lq_count=int(c[i, 1]),
            proper_pairs=int(c[i, 2]),
            first_in_pairs=int(c[i, 3]),
            sequence_reversed=int(c[i, 4]),
            clipped=int(c[i, 5]),
            max_mapq=int(c[i, 6]),
            max_distance=int(c[i, 7]),
            uniq_pos1=int(c[i, 8]),
            uniq_pos2=int(c[i, 9]),
            uniq_pos3=int(c[i, 10]),
            span=int(span[i]),
            max_log_qual=int(maxlq[i]),
            has_indel_good_support=bool(has_good[i]),
            has_realignment_support=bool(has_realn[i]),
        )
        events.append(ev)
        infos.append(info)
    for i in range(N):
        ph = {}
        for k in range(int(phase_off[i]), int(phase_off[i + 1])):
            ph[events[int(phase_idx[k])]] = int(phase_cnt[k])
        infos[i].phase = ph

    buckets = [BucketFirstPass() for _ in range(int(n_buckets.value))]
    sample_haps: dict = {}
    for i in range(N):
        hap = HaplotypeInfo()
        hap.ever_together = {events[int(ever[k])] for k in range(int(ever_off[i]), int(ever_off[i + 1]))}
        hap.always_together = {
            events[int(always[k])] for k in range(int(always_off[i]), int(always_off[i + 1]))
        }
        sample_haps[events[i]] = hap
        if in_bucket[i]:
            b = (events[i].pos - region_begin) // BUCKET_SIZE
            if 0 <= b < len(buckets):
                buckets[b].events[events[i]] = infos[i]
    return buckets, sample_haps
