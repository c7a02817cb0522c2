"""Staleness guard for the tracked fallback binary
(graphtyper_tpu/libgt_native.so).

The fresh-checkout rationale for committing the binary only holds if it
exports every native symbol the Python bindings reference — a stale binary
once shipped without gt_fp_extract and broke the suite at import on a fresh
checkout. This test diffs the tracked .so's dynamic exports against the set
of ``gt_*`` symbols referenced anywhere in the Python sources, so staleness
fails fast instead of surfacing as an AttributeError deep in a pipeline run.
"""

import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TRACKED_SO = os.path.join(REPO, "graphtyper_tpu", "libgt_native.so")

# symbols referenced via getattr/hasattr probes are optional capabilities in
# the bindings, but the tracked binary must still provide them: it is the
# build of record for fresh checkouts
_SYMBOL_RE = re.compile(r"\bgt_[a-z0-9_]+\b")


def _referenced_symbols() -> set[str]:
    syms: set[str] = set()
    pkg = os.path.join(REPO, "graphtyper_tpu")
    for dirpath, _dirnames, filenames in os.walk(pkg):
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            with open(os.path.join(dirpath, fn)) as f:
                text = f.read()
            for line in text.splitlines():
                if "lib." in line or "hasattr(lib" in line or "getattr(lib" in line:
                    syms.update(_SYMBOL_RE.findall(line))
    return syms


def _exported_symbols(so_path: str) -> set[str]:
    out = subprocess.run(
        ["nm", "-D", "--defined-only", so_path],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return {line.split()[-1] for line in out.splitlines() if line.strip()}


@pytest.mark.skipif(not os.path.exists(TRACKED_SO), reason="tracked .so missing")
def test_tracked_so_exports_every_bound_symbol():
    referenced = _referenced_symbols()
    assert referenced, "symbol scan found nothing — scanner regression"
    exported = _exported_symbols(TRACKED_SO)
    missing = sorted(referenced - exported)
    assert not missing, (
        f"tracked graphtyper_tpu/libgt_native.so is stale: missing {missing}; "
        "rebuild it with `make -C native portable`"
    )


@pytest.mark.skipif(not os.path.exists(TRACKED_SO), reason="tracked .so missing")
def test_tracked_so_is_portable_isa():
    """The tracked binary must not require AVX-512 (built -march=x86-64-v2);
    a -march=native build on a wide machine would SIGILL elsewhere."""
    out = subprocess.run(
        ["objdump", "-d", TRACKED_SO], capture_output=True, text=True, check=True
    ).stdout
    # zmm registers only appear in AVX-512 encodings
    assert "zmm" not in out, "tracked .so contains AVX-512 code; rebuild with `make -C native portable`"
