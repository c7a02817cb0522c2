"""Rep-sharded distributed alignment (VERDICT r4 #4).

Sample-sharded cohort calling (parallel/distributed.py genotype_distributed)
leaves each host aligning its OWN shard's deduplicated (pos, seq)
representatives — and because duplicate reads concentrate within samples,
the rep count barely shrinks as hosts are added, so the align stage (the
dominant call-iteration cost) does not divide. The reference has the same
cohort-dedup structure in its pooled reader
(src/utilities/hts_parallel_reader.cpp:666-684).

This module divides it. The align work unit is the ORIENTED rep sequence
(the prep "row", pipeline/native_caller.py _PrepEntry): find_genotype_paths
is a pure function of the sequence bytes against the (deterministic,
replicated) graph + index, so per-row results are host-interchangeable.
Per call iteration:

1. every host collects the distinct row sequences across its pools
   (gt_prep_fetch_seqs; the prep is cached, so the later call_pool reuses
   the identical dedup/rows);
2. one allgather ships the seq universes; the sorted union is the global
   work space, partitioned round-robin;
3. each host aligns its partition (NativeAligner.align_rows_raw — the
   serialized-Geno gt_align_fetch layout) and a second allgather ships the
   tables;
4. the concatenated table + seq->index map become a RepOracle;
   gt_call_finish imports resolved rows (ExtView in native/gt_align.cpp)
   and skips find_genotype_paths for them, so each host aligns ~1/n_hosts
   of the union instead of ~all of it.

Byte identity: the imported Geno is the exact serialization round-trip of
what the host's own find_genotype_paths would produce (same bytes, same
graph/index/seed-filter), asserted by tests/parallel/test_rep_shard.py and
the 2-process e2e.
"""

from __future__ import annotations

import pickle

import numpy as np

EXT_KEYS = (
    "longest", "poff", "p_start", "p_end", "p_rsi", "p_rei", "p_mm",
    "soff", "s_vorder", "noff", "nums",
)


def _concat_tables(tables: list[dict]) -> dict:
    """Concatenate per-host serialized Geno tables, rebasing the offset
    arrays (poff -> path base, soff -> site base, noff -> num base)."""
    out = {k: [] for k in EXT_KEYS}
    p_base = s_base = n_base = 0
    n_genos = 0
    for t in tables:
        out["longest"].append(t["longest"])
        out["poff"].append(t["poff"][1:] + p_base if len(t["poff"]) > 1 else t["poff"][1:])
        out["p_start"].append(t["p_start"])
        out["p_end"].append(t["p_end"])
        out["p_rsi"].append(t["p_rsi"])
        out["p_rei"].append(t["p_rei"])
        out["p_mm"].append(t["p_mm"])
        out["soff"].append(t["soff"][1:] + s_base if len(t["soff"]) > 1 else t["soff"][1:])
        out["s_vorder"].append(t["s_vorder"])
        out["noff"].append(t["noff"][1:] + n_base if len(t["noff"]) > 1 else t["noff"][1:])
        out["nums"].append(t["nums"])
        n_genos += len(t["longest"])
        p_base += len(t["p_start"])
        s_base += len(t["s_vorder"])
        n_base += len(t["nums"])
    merged = {}
    merged["longest"] = np.concatenate(out["longest"]) if n_genos else np.zeros(0, np.int32)
    merged["poff"] = np.concatenate([np.zeros(1, np.int64)] + out["poff"])
    for k in ("p_start", "p_end", "p_rsi", "p_rei", "p_mm", "s_vorder", "nums"):
        dt = {"p_start": np.int64, "p_end": np.int64, "s_vorder": np.int64,
              "nums": np.uint16}.get(k, np.int32)
        merged[k] = (np.concatenate(out[k]) if out[k] else np.zeros(0, dt)).astype(dt)
    merged["soff"] = np.concatenate([np.zeros(1, np.int64)] + out["soff"])
    merged["noff"] = np.concatenate([np.zeros(1, np.int64)] + out["noff"])
    return merged


class RepOracle:
    """seq bytes -> imported-Geno index over the exchanged global table.
    resolve() maps one prep's rows to the 12 flat arrays gt_call_finish
    imports (ExtView layout; unresolved rows fall back to host alignment)."""

    def __init__(self, seq_to_idx: dict[bytes, int], table: dict):
        self.seq_to_idx = seq_to_idx
        self.table = table
        self.n_resolved = 0
        self.n_rows = 0

    def resolve(self, codes: np.ndarray, lens: np.ndarray):
        n_rows = len(lens)
        row_ext = np.empty(n_rows, dtype=np.int64)
        get = self.seq_to_idx.get
        for i in range(n_rows):
            row_ext[i] = get(codes[i, : lens[i]].tobytes(), -1)
        self.n_rows += n_rows
        self.n_resolved += int((row_ext >= 0).sum())
        t = self.table
        return (
            row_ext, t["longest"], t["poff"], t["p_start"], t["p_end"],
            t["p_rsi"], t["p_rei"], t["p_mm"], t["soff"], t["s_vorder"],
            t["noff"], t["nums"],
        )


def local_row_seqs(hts_pools: list[list[str]], region, sam_flag_filter: int,
                   ref_path: str | None = None) -> set[bytes]:
    """Distinct oriented row sequences across this host's pools. Builds (and
    caches) each pool's prep, so the subsequent call_pool reuses the same
    dedup and row numbering."""
    from graphtyper_tpu.io.native import get_lib
    from graphtyper_tpu.pipeline.native_caller import _get_prep, _setup_lib

    lib = get_lib()
    _setup_lib(lib)
    seqs: set[bytes] = set()
    for pool in hts_pools:
        entry = _get_prep(lib, pool, region, sam_flag_filter, False,
                          position_filter=False, ref_path=ref_path)
        if entry is None:
            continue
        codes, lens = entry.fetch_row_seqs(lib)
        for i in range(len(lens)):
            seqs.add(codes[i, : lens[i]].tobytes())
    return seqs


def build_oracle(graph, index, my_seqs: set[bytes], allgather_bytes,
                 n_hosts: int, host: int, n_threads: int = 0) -> RepOracle:
    """Two-collective exchange: seq universes, then aligned-result tables.
    Every host computes the identical union order, so partition and global
    indices agree without further coordination."""
    from graphtyper_tpu.typer.native_align import NativeAligner

    universes = [pickle.loads(b) for b in allgather_bytes(pickle.dumps(sorted(my_seqs)))]
    union: list[bytes] = sorted(set().union(*universes))
    mine = union[host::n_hosts]
    aligner = NativeAligner(graph, index)
    table_mine = aligner.align_rows_raw(mine, n_threads=n_threads)
    tables = [pickle.loads(b) for b in allgather_bytes(pickle.dumps(table_mine))]
    merged = _concat_tables(tables)
    seq_to_idx: dict[bytes, int] = {}
    base = 0
    for h in range(n_hosts):
        part = union[h::n_hosts]
        for i, s in enumerate(part):
            seq_to_idx[s] = base + i
        base += len(part)
    return RepOracle(seq_to_idx, merged)
