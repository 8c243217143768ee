"""Test config: force the CPU backend with 8 virtual devices.

The real TPU is reached through a remote tunnel (slow per-process init and
only one chip); tests exercise numerics + sharding on a virtual 8-device CPU
mesh (SURVEY.md §4: multi-process CPU simulation is the "fake backend" for
distributed tests).  The benchmark (bench.py) runs on the real chip.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns etc.)")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The suite compiles several hundred XLA CPU programs; with every
    executable kept alive by jax's C++-level caches, the LLVM JIT state
    eventually corrupts and backend_compile segfaults deterministically
    around test ~177 (reproduced twice, crash inside
    jax/_src/compiler.py backend_compile_and_load; every module passes in
    isolation).  Dropping the caches at module boundaries keeps the live
    executable count bounded; intra-module caching (where the reuse is)
    is unaffected.
    """
    yield
    jax.clear_caches()
