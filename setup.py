"""Packaging — the analog of the reference's native-extension build
(ref: setup.py:4-27, which builds autosmoothquant._CUDA from csrc/int8gemm).
Here the native layer is csrc/asq_io.cc (checkpoint I/O; compute kernels are
Pallas/XLA and need no compilation step). The library is a plain C-ABI
shared object consumed via ctypes, built with a custom build step."""

import subprocess
from pathlib import Path

from setuptools import setup, find_packages
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        subprocess.check_call(["make", "-C", str(root / "csrc")])
        super().run()


setup(
    name="autosmoothquant_tpu",
    version="0.1.0",
    description=("TPU-native SmoothQuant quantization + serving framework "
                 "(JAX/XLA/Pallas)"),
    packages=find_packages(exclude=["tests", "examples", "benchmarks"]),
    package_data={"autosmoothquant_tpu": ["_native/*.so"]},
    cmdclass={"build_py": BuildWithNative},
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "ml_dtypes"],
)
