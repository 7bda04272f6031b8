"""Uniform B-spline evaluation: Euclidean (R^d) and cumulative SO(3).

TPU-native re-derivation of the reference's spline math
(/root/reference include/OpenCameraCalibrator/basalt_spline/
spline_common.h:67-133 blending matrices and ceres_spline_helper.h:101-220
evaluators). Key design differences from the reference:

* Evaluators are plain JAX functions of a *static-size knot window*
  ``(N, ...)`` plus the normalized position ``u`` in the segment, so they
  ``vmap`` over measurement batches and differentiate (fwd or rev) w.r.t.
  knots — this replaces Ceres Jet-templated evaluation.
* Time derivatives of the cumulative SO(3) spline are obtained with
  ``jax.jvp`` over ``u`` (exact, composes with outer autodiff) instead of
  the hand-derived adjoint/Lie-bracket chain in ceres_spline_helper.h
  (:148-182).

Conventions: order ``N`` splines have degree ``N-1``; a measurement at time
``t`` with knot spacing ``dt`` and origin ``t0`` lives in segment
``i = floor((t-t0)/dt)`` with local coordinate ``u = (t-t0)/dt - i`` and
touches knots ``i .. i+N-1``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.ops import lie


@functools.lru_cache(maxsize=None)
def blending_matrix(order: int, cumulative: bool = False) -> np.ndarray:
    """Uniform B-spline blending matrix M (order x order), float64.

    ``b_j(u) = sum_n M[j, n] u^n`` gives the weight of control point
    ``p_{i+j}``. With ``cumulative=True`` returns the cumulative matrix
    ``M~[j] = sum_{s>=j} M[s]`` used by the Lie-group spline
    (mirrors spline_common.h:67-98).
    """
    n = order
    m = np.zeros((n, n), dtype=np.float64)
    for j in range(n):  # control point index
        for i in range(n):  # power of u
            s_sum = 0.0
            for s in range(j, n):
                s_sum += (-1.0) ** (s - j) * math.comb(n, s - j) * (n - s - 1.0) ** (n - 1 - i)
            m[j, i] = math.comb(n - 1, n - 1 - i) * s_sum
    m /= math.factorial(n - 1)
    if cumulative:
        m = np.flipud(np.cumsum(np.flipud(m), axis=0))
    return m


@functools.lru_cache(maxsize=None)
def _deriv_factors(order: int, deriv: int) -> np.ndarray:
    """Row vector f with (d^deriv/du^deriv) u^n = f[n] * u^(n-deriv)."""
    f = np.zeros(order)
    for nn in range(deriv, order):
        f[nn] = math.factorial(nn) / math.factorial(nn - deriv)
    return f


def u_powers(u: jax.Array, order: int, deriv: int = 0) -> jax.Array:
    """Vector [d^deriv/du^deriv u^n for n in 0..order-1], shape (order,)."""
    u = jnp.asarray(u)
    f = jnp.asarray(_deriv_factors(order, deriv)).astype(u.dtype)
    # u^0 .. u^{order-1} by cumulative product (keeps u's dtype exactly).
    pow_all = jnp.concatenate(
        [jnp.ones((1,), u.dtype), jnp.cumprod(jnp.full((order - 1,), u))])
    ks = np.maximum(np.arange(order) - deriv, 0)
    return f * pow_all[ks]


def spline_coords(t, t0, dt, num_knots: int, order: int):
    """Map times to (segment index, local coordinate u).

    Segment index is clipped to the valid range so shapes stay static;
    callers must mask out-of-range measurements themselves (the reference
    simply refuses to add them, imu_camera_calibrator.cc:102-120).
    """
    s = (t - t0) / dt
    i = jnp.clip(jnp.floor(s), 0, num_knots - order).astype(jnp.int32)
    u = s - i.astype(s.dtype)
    return i, u


def gather_window(knots: jax.Array, idx: jax.Array, order: int) -> jax.Array:
    """knots (K, ...) , idx (...,) -> windows (..., order, ...)."""
    offs = jnp.arange(order, dtype=idx.dtype)
    gather_idx = idx[..., None] + offs  # (..., order)
    return jnp.take(knots, gather_idx, axis=0)


# ---------------------------------------------------------------------------
# Euclidean spline
# ---------------------------------------------------------------------------

def r3_eval(window: jax.Array, u: jax.Array, dt, deriv: int = 0, order: int | None = None) -> jax.Array:
    """Evaluate an R^d spline (or its time derivative) on one knot window.

    window: (N, d); u: scalar; returns (d,). ``deriv``-th time derivative
    includes the 1/dt^deriv factor (ceres_spline_helper.h:198-220).
    """
    n = order if order is not None else window.shape[-2]
    M = jnp.asarray(blending_matrix(n), dtype=window.dtype)
    coeff = M @ u_powers(u, n, deriv)  # (N,)
    out = jnp.einsum("n,nd->d", coeff, window)
    if deriv:
        out = out / (dt ** deriv)
    return out


# ---------------------------------------------------------------------------
# Cumulative SO(3) spline
# ---------------------------------------------------------------------------

def so3_eval(qwindow: jax.Array, u: jax.Array, order: int | None = None) -> jax.Array:
    """Cumulative Lie-group spline value: unit quaternion at local coord u.

    q(u) = q_i ⊗ prod_{j=1}^{N-1} exp(lam_j(u) * log(q_{i+j-1}^{-1} q_{i+j}))
    (ceres_spline_helper.h:101-145). qwindow: (N, 4); returns (4,).
    """
    n = order if order is not None else qwindow.shape[-2]
    Mc = jnp.asarray(blending_matrix(n, cumulative=True), dtype=qwindow.dtype)
    lam = Mc @ u_powers(u, n)  # (N,), lam[0] == 1 identically
    d = lie.so3_log(lie.quat_multiply(lie.quat_conjugate(qwindow[:-1]), qwindow[1:]))  # (N-1, 3)
    q = qwindow[0]
    for j in range(1, n):
        q = lie.quat_multiply(q, lie.so3_exp(lam[j] * d[j - 1]))
    return q


def so3_vel(qwindow: jax.Array, u: jax.Array, dt, order: int | None = None):
    """(q(u), body-frame angular velocity omega) at local coord u.

    omega_body = 2 * vec(q^{-1} ⊗ dq/dt) from quaternion kinematics
    dq/dt = 0.5 q ⊗ [0, omega_body]; dq/du obtained by jvp.
    """
    q, dq_du = jax.jvp(lambda uu: so3_eval(qwindow, uu, order), (u,), (jnp.ones_like(u),))
    omega = 2.0 * lie.quat_multiply(lie.quat_conjugate(q), dq_du)[..., 1:4] / dt
    return q, omega


def so3_accel(qwindow: jax.Array, u: jax.Array, dt, order: int | None = None):
    """(q, omega, domega/dt) — body-frame angular velocity and acceleration."""
    def vel_fn(uu):
        return so3_vel(qwindow, uu, dt, order)

    (q, omega), (_, domega_du) = jax.jvp(vel_fn, (u,), (jnp.ones_like(u),))
    return q, omega, domega_du / dt


# ---------------------------------------------------------------------------
# Batched convenience wrappers (vmap over measurements)
# ---------------------------------------------------------------------------

def r3_eval_batch(knots: jax.Array, t: jax.Array, t0, dt, deriv: int = 0, order: int = 6) -> jax.Array:
    """knots (K, d), t (M,) -> (M, d)."""
    idx, u = spline_coords(t, t0, dt, knots.shape[0], order)
    windows = gather_window(knots, idx, order)  # (M, N, d)
    return jax.vmap(lambda w, uu: r3_eval(w, uu, dt, deriv, order))(windows, u)


def so3_eval_batch(qknots: jax.Array, t: jax.Array, t0, dt, order: int = 6) -> jax.Array:
    idx, u = spline_coords(t, t0, dt, qknots.shape[0], order)
    windows = gather_window(qknots, idx, order)
    return jax.vmap(lambda w, uu: so3_eval(w, uu, order))(windows, u)


def so3_vel_batch(qknots: jax.Array, t: jax.Array, t0, dt, order: int = 6):
    idx, u = spline_coords(t, t0, dt, qknots.shape[0], order)
    windows = gather_window(qknots, idx, order)
    return jax.vmap(lambda w, uu: so3_vel(w, uu, dt, order))(windows, u)
