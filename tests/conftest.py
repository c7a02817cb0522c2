"""Test config: force JAX onto a virtual 8-device CPU mesh so sharding tests
run without TPU hardware (the driver separately dry-runs multi-chip)."""

import os

# The session env presets JAX_PLATFORMS=axon (real TPU via tunnel), and the
# axon sitecustomize registers its PJRT plugin regardless of the env var —
# jax.config.update after import is what actually forces CPU here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR
