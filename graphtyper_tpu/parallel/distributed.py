"""Multi-host orchestration: region sharding over hosts (DCN) with
data-parallel read batches within each host (ICI).

The reference scales beyond one machine only by running independent processes
on ~50kb regions and concatenating the per-region VCFs (SURVEY §2.5 "Region
sharding", main.cpp:30-58, genotype.cpp:734-739). The TPU-native equivalent
keeps that region independence — regions are embarrassingly parallel — and
adds a real multi-host runtime under it:

- `initialize()` brings up jax.distributed so all hosts share one JAX runtime
  and every host sees the global device set.
- `assign_regions()` deterministically shards the region list across hosts;
  each host genotypes only its share (graph + index replicated per region,
  never crossing hosts — the DCN boundary carries no tensor traffic).
- Within a host, read batches are data-parallel over the local mesh
  (parallel/mesh.py) with psum over ICI.
- `host_mesh()` builds the local-device mesh; `global_mesh()` builds a
  ("host", "data") mesh for collectives that must span hosts (e.g. cohort-
  wide INFO accumulation), mapping the host axis onto DCN.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host JAX runtime (no-op when single-process).

    jax.distributed.initialize discovers cluster parameters automatically on
    managed platforms; pass them explicitly otherwise."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def num_hosts() -> int:
    return jax.process_count()


def host_id() -> int:
    return jax.process_index()


def assign_regions(regions: list, n_hosts: int | None = None, host: int | None = None) -> list:
    """Deterministic contiguous split of the region list for this host.

    Contiguous (not round-robin) so each host touches a minimal span of the
    reference and BAM files — locality mirrors the reference's per-process
    region ranges (main.cpp:30-58)."""
    n_hosts = n_hosts if n_hosts is not None else num_hosts()
    host = host if host is not None else host_id()
    if n_hosts <= 1:
        return list(regions)
    if not (0 <= host < n_hosts):
        raise ValueError(f"host {host} not in [0, {n_hosts})")
    bounds = np.linspace(0, len(regions), n_hosts + 1).astype(int)
    return list(regions[bounds[host] : bounds[host + 1]])


def host_mesh(axis: str = "data") -> Mesh:
    """Mesh over this host's local devices (ICI only)."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def global_mesh(host_axis: str = "host", data_axis: str = "data") -> Mesh:
    """("host", "data") mesh over all devices: the host axis crosses DCN, the
    data axis stays on ICI. Collectives over `data` ride ICI; only explicit
    reductions over `host` pay DCN latency."""
    n_hosts = jax.process_count()
    devices = np.array(jax.devices()).reshape(n_hosts, -1)
    return Mesh(devices, (host_axis, data_axis))


def genotype_regions_distributed(
    ref_path: str,
    sams: list[str],
    regions: list[str],
    output_path: str,
    n_hosts: int | None = None,
    host: int | None = None,
    **kw,
) -> list[str]:
    """Genotype this host's share of the regions (the cross-host analog of
    genotype_regions). Host identity comes from the jax.distributed runtime
    when initialized; pass n_hosts/host explicitly to run reference-style
    independent processes without one. All hosts write into the same
    region-structured output tree, so the union of all hosts' outputs is the
    complete result; merge afterwards with
    pipeline/vcf_operations.vcf_concatenate when a single file is wanted."""
    from graphtyper_tpu.pipeline.genotype import genotype_regions

    mine = assign_regions(regions, n_hosts, host)
    outs: list[str] = []
    for region in mine:
        outs.extend(genotype_regions(ref_path, sams, region, output_path, **kw))
    return outs
