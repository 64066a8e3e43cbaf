"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on fake CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count), JAX's standard trick —
the real TPU chip is reserved for bench.py.

NOTE: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough — jax.config.update("jax_platforms", ...) wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def rulebook_lib(tmp_path_factory):
    """The reference's compiled spconv rulebook (shared: test_golden_rulebook
    + test_golden_maxpool both drive it; one g++ compile per session)."""
    import ctypes
    from pathlib import Path

    from tests.ref_tools import compile_reference_driver

    lib = compile_reference_driver(
        tmp_path_factory,
        Path(__file__).parent / "golden_cpp" / "ref_rulebook.cc",
        [Path("/root/reference/libs/spconv/include")], "ref_rulebook")
    lib.ref_get_indice_pairs.restype = ctypes.c_int
    return lib
