"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices (the
driver separately dry-run-compiles the multi-chip path via
``__graft_entry__.dryrun_multichip``). float64 is enabled so numerical
tests can compare against high-precision references.
"""

import os

# Force CPU: the outer environment pins JAX to a TPU tunnel (sitecustomize
# registers an "axon" PJRT plugin at interpreter start), which tests must
# never touch. Set the env var too, in case jax has not been imported yet —
# backend *initialization* (not import) is what contacts the tunnel, and a
# config update alone does not always prevent plugin discovery.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: the suite compiles dozens of LM graphs;
# caching across runs cuts full-suite wall time dramatically (VERDICT r1 #9).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_oicc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
