"""Test harness: run everything on a virtual 8-device CPU mesh.

Two environment quirks handled here (SURVEY.md §4 item 5):
* torch must be imported BEFORE jax on this image — the reverse order
  deadlocks in native-library init (futex wait).  Parity tests use torch
  as the numerical oracle, so import it eagerly.
* The axon TPU plugin ignores ``JAX_PLATFORMS=cpu``; the working override is
  ``jax.config.update('jax_platforms', 'cpu')`` before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import torch  # noqa: E402,F401  (must precede jax; see module docstring)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
