"""Robust-loss weighting (IRLS) for the LM solver.

Replaces Ceres ``HuberLoss`` usage in the reference (width 1.345 px for BA,
src/core/camera_calibrator.cc:140-144, and on spline reprojection residuals,
spline_trajectory_estimator.impl.h:532,599-601). Implemented as iteratively
reweighted least squares: each LM outer iteration computes per-residual-group
weights at the current point and treats them as constants in the
linearization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_sqrt_weights(r: jax.Array, delta: float, group_size: int = 1) -> jax.Array:
    """sqrt(IRLS weight) per residual component for a Huber loss.

    Residuals are grouped into consecutive chunks of ``group_size`` (e.g. 2
    for pixel reprojection errors); the Huber loss is applied to the group
    norm, matching Ceres' per-residual-block robustification.
    Returns an array shaped like ``r`` to multiply residuals (and Jacobian
    rows) by.
    """
    r = jax.lax.stop_gradient(r)
    g = r.reshape(-1, group_size)
    s = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
    w = jnp.where(s <= delta, 1.0, jnp.sqrt(delta / s))
    return jnp.repeat(w, group_size).reshape(r.shape)


def huber_cost(r: jax.Array, delta: float, group_size: int = 1) -> jax.Array:
    """0.5 * sum of Huber(group norms): the true robust objective."""
    g = r.reshape(-1, group_size)
    s2 = jnp.sum(g * g, axis=-1)
    s = jnp.sqrt(s2 + 1e-20)
    rho = jnp.where(s <= delta, s2, 2.0 * delta * s - delta * delta)
    return 0.5 * jnp.sum(rho)
