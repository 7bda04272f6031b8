"""Gyroscope orientation integration (RK4 on quaternions), autodiff-safe.

Replacement for the reference's templated RK4 integrator
(/root/reference include/OpenCameraCalibrator/utils/gyro_integration.h:
82-203, QuatIntegrationStepRK4 / IntegrateGyroInterval), used by the
multi-pose static IMU calibrator's gyro residual
(static_imu_calibrator.h:56-143). Implemented as a ``lax.scan`` so it jits
once and differentiates w.r.t. gyro corrections (for the calibration fit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openimucameracalibrator_tpu.ops import lie


def _omega_matrix_apply(q, w):
    """dq/dt = 0.5 * q ⊗ [0, w] as a quaternion product."""
    wq = jnp.concatenate([jnp.zeros_like(w[..., :1]), w], axis=-1)
    return 0.5 * lie.quat_multiply(q, wq)


def rk4_step(q, w0, w1, dt):
    """One RK4 step from gyro sample w0 (at t) to w1 (at t+dt)
    (gyro_integration.h:82-108). Returns the normalized quaternion."""
    wm = 0.5 * (w0 + w1)
    k1 = _omega_matrix_apply(q, w0)
    k2 = _omega_matrix_apply(q + 0.5 * dt * k1, wm)
    k3 = _omega_matrix_apply(q + 0.5 * dt * k2, wm)
    k4 = _omega_matrix_apply(q + dt * k3, w1)
    qn = q + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return lie.quat_normalize(qn)


def integrate_gyro(times: jax.Array, gyro: jax.Array, q0: jax.Array | None = None):
    """Integrate a gyro sequence to a final orientation quaternion.

    times: (N,), gyro: (N, 3) body rates. Returns q mapping the initial
    body frame to the final body frame (IntegrateGyroInterval,
    gyro_integration.h:156-203).
    """
    if q0 is None:
        q0 = lie.quat_identity(gyro.dtype)
    dts = jnp.diff(times)

    def body(q, x):
        w0, w1, dt = x
        return rk4_step(q, w0, w1, dt), None

    q, _ = jax.lax.scan(body, q0, (gyro[:-1], gyro[1:], dts))
    return q
