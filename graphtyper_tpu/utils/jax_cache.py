"""Persistent XLA compilation cache.

First compiles of the bucketed scoring kernels and the Pallas SW kernel cost
20-50s on TPU; the persistent cache amortizes them across processes and runs
(region workers, pool threads, repeated pipeline invocations). Enabled at the
first device-path use; override the location with GT_JAX_CACHE_DIR, disable
with GT_JAX_CACHE_DIR=off.
"""

from __future__ import annotations

import os

_DONE = False


def ensure_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    path = os.environ.get("GT_JAX_CACHE_DIR", "")
    if path == "off":
        return
    if not path:
        # key the default cache by a CPU-feature fingerprint: XLA:CPU AOT
        # entries compiled on a host with different machine features load
        # with "cpu_aot_loader ... could lead to SIGILL" warnings (and risk
        # exactly that), so never share them across heterogeneous hosts
        import hashlib

        fp = "nocpu"
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        fp = hashlib.sha1(line.encode()).hexdigest()[:12]
                        break
        except OSError:
            pass
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "graphtyper_tpu", f"jax-{fp}"
        )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only home: in-memory compiles still work
