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
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite compiles dozens of LM graphs;
# caching across runs cuts full-suite wall time dramatically (VERDICT r1
# #9). NOTE: jax 0.9.0 ignores the JAX_COMPILATION_CACHE_DIR environment
# variable — the config update is the one that works.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_oicc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
