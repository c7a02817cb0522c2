"""Messy-input SV parity: exercises the is_good_sv_read branches (far
mates, one-/both-end clips, edge mapq 15/16, unmapped mates), unpaired
reads, flag-filtered mates (leftover-mate resolution), and dedup fodder —
across the native pooled SV loop, the object path, the Python loop with
the native batch aligner, and the pure-Python loop, with and without the
coverage-bin filter. Driven by the committed fuzz axis (tools/fuzz_diff
fuzz_sv) pinned to two seeds."""

import importlib.util
import os


def _fuzz_mod():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "fuzz_diff", os.path.join(root, "tools", "fuzz_diff.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_sv_messy_parity_seed0(tmp_path):
    fails = _fuzz_mod().fuzz_sv(0, str(tmp_path))
    assert fails == []


def test_sv_messy_parity_seed3(tmp_path):
    fails = _fuzz_mod().fuzz_sv(3, str(tmp_path))
    assert fails == []
