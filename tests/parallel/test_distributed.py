"""Multi-host orchestration helpers (parallel/distributed.py). Host-count > 1
cannot be simulated in one process, so host-sharding math is tested
explicitly and the global mesh shape with a simulated host reshape."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, PartitionSpec as P

from graphtyper_tpu.parallel.distributed import assign_regions, global_mesh, host_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices (see tests/conftest.py)"
)


def test_assign_regions_partitions_completely():
    regions = [f"chr1:{i * 50000 + 1}-{(i + 1) * 50000}" for i in range(23)]
    shards = [assign_regions(regions, 4, h) for h in range(4)]
    # complete, disjoint, ordered, contiguous
    assert sum(shards, []) == regions
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_assign_regions_single_host_identity():
    regions = ["chr1", "chr2"]
    assert assign_regions(regions, 1, 0) == regions


def test_assign_regions_more_hosts_than_regions():
    regions = ["chr1", "chr2"]
    shards = [assign_regions(regions, 5, h) for h in range(5)]
    assert sum(shards, []) == regions
    assert all(len(s) <= 1 for s in shards)


def test_assign_regions_bad_host():
    with pytest.raises(ValueError):
        assign_regions(["chr1"], 2, 2)


def test_host_mesh_local_devices():
    mesh = host_mesh()
    assert mesh.devices.size == len(jax.local_devices())
    assert mesh.axis_names == ("data",)


def test_global_mesh_single_process_shape():
    # single process: host axis has size 1, data axis spans all devices
    mesh = global_mesh()
    assert mesh.axis_names == ("host", "data")
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_two_level_psum_on_simulated_hosts():
    # simulate 2 hosts x 4 chips on the 8-device CPU mesh and run a
    # hierarchical reduction over both axes
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("host", "data"))

    def tile_sum(x):
        s = jax.lax.psum(x.sum(), axis_name="data")
        return jax.lax.psum(s, axis_name="host")

    fn = jax.jit(
        jax.shard_map(tile_sum, mesh=mesh, in_specs=P("host", "data"), out_specs=P(), check_vma=False)
    )
    x = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    total = fn(x)
    np.testing.assert_allclose(float(total), x.sum())
