"""Thin setup shim: metadata lives in pyproject.toml. Builds the native
host runtime (native/libgt_native.so) with the repo Makefile and ships it
as package data so installed trees don't depend on the source checkout.

`pip install .` runs the native build automatically; set GT_SKIP_NATIVE=1
to skip (the library falls back to the pure-Python paths)."""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        here = os.path.dirname(os.path.abspath(__file__))
        native_dir = os.path.join(here, "native")
        so = os.path.join(native_dir, "libgt_native.so")
        if not os.environ.get("GT_SKIP_NATIVE"):
            try:
                subprocess.run(["make", "-C", native_dir], check=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                print(f"warning: native build failed ({e}); installing without libgt_native.so")
        if os.path.exists(so):
            shutil.copy2(so, os.path.join(here, "graphtyper_tpu", "libgt_native.so"))
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
