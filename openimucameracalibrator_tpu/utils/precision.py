"""Explicit precision policy (VERDICT r1: no silent f64->f32 downcasts).

The reference solves everything in double via Ceres. On TPU, float64 is
unavailable: requesting it with x64 disabled silently truncates to f32
and spams "Explicitly requested dtype float64" warnings. Policy:

* Library code never hard-codes ``jnp.float64``. APIs take ``dtype=None``
  and resolve it via :func:`default_dtype` — float64 when the host has
  enabled x64 (CPU tests, golden references), float32 otherwise (TPU).
* The f32 path is made viable at calibration-problem conditioning by the
  Jacobi-equilibrated Cholesky plus one step of iterative refinement in
  the damped solve (solver/lm.py), and is regression-tested against the
  f64 solve at DS3-like conditioning (tests/test_precision.py).
* numpy (host) arrays stay float64 everywhere — IO, telemetry, and
  planning run on the host where doubles are free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_dtype():
    """Highest-precision float available under the current jax config."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def resolve(dtype):
    """``dtype or default_dtype()`` (None-safe helper for API defaults)."""
    return dtype if dtype is not None else default_dtype()
