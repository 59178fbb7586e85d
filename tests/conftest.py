"""Test configuration: CPU backend with 8 virtual devices and float64.

All tests run the same jit programs that run on TPU; CPU x64 gives tight
numeric oracles (autodiff-vs-finite-difference, conservation) and the
virtual 8-device mesh exercises multi-chip sharding without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's site config force-appends an accelerator platform; override
# post-import (this wins over the env var).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: most of the fast tier's wall time is XLA:CPU
# compiles of the same jit programs — cache them across runs (round-5
# VERDICT item 7: fast-tier latency).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference fixture tree not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
