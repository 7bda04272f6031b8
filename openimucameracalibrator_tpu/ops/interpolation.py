"""Timestamp search and signal resampling (lerp / slerp).

Replaces the reference's utils interpolation helpers
(/root/reference src/utils/utils.cc:194-262: FindClosestTimestamp,
InterpolateQuaternions, InterpolateVector3d) with batched,
searchsorted-based JAX versions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openimucameracalibrator_tpu.ops import lie


def _bracket(times: jax.Array, query: jax.Array):
    """Indices (i0, i1) and fraction a with times[i0] <= q <= times[i1]."""
    i1 = jnp.clip(jnp.searchsorted(times, query, side="right"), 1, times.shape[0] - 1)
    i0 = i1 - 1
    t0 = times[i0]
    t1 = times[i1]
    a = (query - t0) / jnp.maximum(t1 - t0, 1e-12)
    return i0, i1, jnp.clip(a, 0.0, 1.0)


def interp_vector(times: jax.Array, values: jax.Array, query: jax.Array) -> jax.Array:
    """Linear resampling of (N, d) samples at (M,) query times (clamped)."""
    i0, i1, a = _bracket(times, query)
    return values[i0] * (1.0 - a[..., None]) + values[i1] * a[..., None]


def interp_quaternion(times: jax.Array, quats: jax.Array, query: jax.Array) -> jax.Array:
    """Slerp resampling of (N, 4) quats at (M,) query times (clamped)."""
    i0, i1, a = _bracket(times, query)
    return lie.quat_slerp(quats[i0], quats[i1], a)


def closest_index(times: jax.Array, query: jax.Array) -> jax.Array:
    """Index of the sample nearest each query time."""
    i0, i1, a = _bracket(times, query)
    return jnp.where(a < 0.5, i0, i1)


def moving_average(x: jax.Array, window: int) -> jax.Array:
    """Centered moving average over axis 0 with edge clamping.

    Mirrors the 15-tap SimpleMovingAverage smoothing of angular-velocity
    signals (imu_to_camera_rotation_estimator.cc:203-218,
    moving_average.h:5-47).
    """
    n = x.shape[0]
    pad_lo = window // 2
    pad_hi = window - 1 - pad_lo
    xp = jnp.concatenate([
        jnp.repeat(x[:1], pad_lo, axis=0), x, jnp.repeat(x[-1:], pad_hi, axis=0)])
    c = jnp.cumsum(xp, axis=0)
    zero = jnp.zeros_like(c[:1])
    c = jnp.concatenate([zero, c], axis=0)
    return (c[window:] - c[:-window]) / window
