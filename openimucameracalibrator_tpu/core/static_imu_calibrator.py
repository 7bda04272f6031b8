"""Static multi-pose IMU intrinsic calibration (Tedaldi ICRA'14 / imu_tk).

TPU-native equivalent of the reference's StaticImuCalibrator
(/root/reference src/core/static_imu_calibrator.cc:54-337 and the residual
functors in static_imu_calibrator.h:18-143):

* accelerometer: detect static intervals by a variance-threshold sweep
  (threshold = k * init-variance, k = 1..10, CalibrateAcc :54-186), then
  fit misalignment/scale/bias so every static mean has norm g:
  r_i = g - || T K (a_i - b) ||.
* gyroscope: bias from the static samples; misalignment/scale fitted so
  RK4-integrating the calibrated gyro across each dynamic segment maps the
  gravity versor of one static pose onto the next
  (MultiPosGyroResidual, static_imu_calibrator.h:56-143).

The interval sweep runs on host (small); each candidate fit is a jitted LM
solve. Gyro integration over all dynamic segments is a single padded
``vmap(lax.scan)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.ops import imu_integration, intervals, lie
from openimucameracalibrator_tpu.solver import blocks, lm
from openimucameracalibrator_tpu.utils.types import ImuData, ImuIntrinsics
from openimucameracalibrator_tpu.utils import precision


@dataclasses.dataclass
class StaticImuCalibratorOptions:
    gravity: float = 9.81  # static_imu_calibrator.cc:44-52
    min_intervals: int = 12
    init_static_duration_s: float = 30.0
    min_interval_samples: int = 100
    max_threshold_mult: int = 10


def _accel_matrices(theta):
    """theta (9,) -> (T upper-triangular misalignment, K diag, bias).

    imu_tk accelerometer convention: T has unit diagonal with three upper
    off-diagonal elements (static_imu_calibrator.h:18-54)."""
    T = jnp.array([[1.0, -theta[0], theta[1]],
                   [0.0, 1.0, -theta[2]],
                   [0.0, 0.0, 1.0]], dtype=theta.dtype)
    K = jnp.diag(theta[3:6])
    b = theta[6:9]
    return T, K, b


def _gyro_matrices(theta):
    """theta (9,) -> (T full misalignment, K diag). Bias is pre-estimated.

    imu_tk gyroscope convention: six off-diagonal misalignment terms
    (static_imu_calibrator.h:56-143)."""
    T = jnp.array([[1.0, -theta[0], theta[1]],
                   [theta[2], 1.0, -theta[3]],
                   [-theta[4], theta[5], 1.0]], dtype=theta.dtype)
    K = jnp.diag(theta[6:9])
    return T, K


def calibrate_accelerometer(static_means: np.ndarray, g: float = 9.81):
    """Fit accel misalignment/scale/bias from static-pose means.

    Returns (ImuIntrinsics, final_cost). static_means: (M, 3), M >= 9.
    """
    means = jnp.asarray(static_means, precision.default_dtype())
    layout = blocks.BlockLayout([blocks.BlockSpec("theta", (9,))])

    def residual(params):
        T, K, b = _accel_matrices(params["theta"])
        cal = (means - b) @ (T @ K).T
        return g - jnp.linalg.norm(cal, axis=-1)

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    theta0 = jnp.asarray([0, 0, 0, 1, 1, 1, 0, 0, 0], precision.default_dtype())
    res = lm.lm_optimize(lin, cost, retract, {"theta": theta0}, layout.free_mask(),
                         lm.LMConfig(max_iters=100, ftol=1e-12))
    T, K, b = _accel_matrices(res.params["theta"])
    intr = ImuIntrinsics(misalignment=np.asarray(T), scale=np.asarray(jnp.diag(K)),
                         bias=np.asarray(b))
    return intr, float(res.cost)


def calibrate_gyroscope(imu: ImuData, static_ivs, accel_intr: ImuIntrinsics,
                        g: float = 9.81):
    """Fit gyro misalignment/scale given calibrated accel gravity versors."""
    # Bias: mean gyro over all static samples (CalibrateAccGyro :188-220).
    static_mask = np.zeros(len(imu.times), bool)
    for iv in static_ivs:
        static_mask[iv.start:iv.end + 1] = True
    gyro_bias = imu.gyro[static_mask].mean(axis=0)

    # Gravity versors at each static interval (calibrated accel).
    acc_means = intervals.interval_means(imu.accel, static_ivs, trim=10)
    cal_means = accel_intr.unbias_normalize(acc_means)
    versors = cal_means / np.linalg.norm(cal_means, axis=-1, keepdims=True)

    # Dynamic segments between consecutive static intervals, padded.
    segs = []
    for a, b in zip(static_ivs[:-1], static_ivs[1:]):
        s, e = a.end - 10, b.start + 10
        segs.append((s, e))
    max_len = max(e - s + 1 for s, e in segs)
    M = len(segs)
    seg_gyro = np.zeros((M, max_len, 3))
    seg_t = np.zeros((M, max_len))
    for k, (s, e) in enumerate(segs):
        n = e - s + 1
        seg_gyro[k, :n] = imu.gyro[s:e + 1] - gyro_bias
        seg_t[k, :n] = imu.times[s:e + 1]
        # Pad with zero rates and repeated timestamps (dt = 0 -> no-op).
        seg_gyro[k, n:] = 0.0
        seg_t[k, n:] = imu.times[e]

    seg_gyro_j = jnp.asarray(seg_gyro)
    seg_t_j = jnp.asarray(seg_t)
    v0 = jnp.asarray(versors[:-1])
    v1 = jnp.asarray(versors[1:])
    layout = blocks.BlockLayout([blocks.BlockSpec("theta", (9,))])

    def residual(params):
        T, K = _gyro_matrices(params["theta"])
        TK = T @ K

        def one(gy, tt, u0, u1):
            cal = gy @ TK.T
            q = imu_integration.integrate_gyro(tt, cal)
            # q maps initial body frame to final: a fixed world vector seen
            # in the final frame is R(q)^T applied to its initial-frame
            # coordinates.
            pred = lie.quat_rotate(lie.quat_conjugate(q), u0)
            return pred - u1

        return jax.vmap(one)(seg_gyro_j, seg_t_j, v0, v1).reshape(-1)

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    theta0 = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1, 1], precision.default_dtype())
    res = lm.lm_optimize(lin, cost, retract, {"theta": theta0}, layout.free_mask(),
                         lm.LMConfig(max_iters=60, ftol=1e-12))
    T, K = _gyro_matrices(res.params["theta"])
    return ImuIntrinsics(misalignment=np.asarray(T), scale=np.asarray(jnp.diag(K)),
                         bias=gyro_bias), float(res.cost)


def calibrate(imu: ImuData, options: StaticImuCalibratorOptions | None = None):
    """Full multi-pose calibration: threshold sweep + accel fit + gyro fit.

    Returns (accel_intrinsics, gyro_intrinsics, info dict).
    """
    opts = options or StaticImuCalibratorOptions()
    rate = imu.rate_hz
    n_init = int(opts.init_static_duration_s * rate)
    if n_init < 100:
        raise ValueError("need an initial static period for variance estimation")
    init_var = intervals.rolling_variance_norm(
        imu.accel[:n_init], half_window=int(rate // 2))
    base = float(np.min(init_var[np.isfinite(init_var)])) + 1e-12

    best = None
    for k in range(1, opts.max_threshold_mult + 1):
        thr = k * base * 2.0
        ivs, _ = intervals.static_intervals(
            imu.accel, thr, half_window=int(rate // 2),
            min_length=opts.min_interval_samples)
        if len(ivs) < opts.min_intervals:
            continue
        means = intervals.interval_means(imu.accel, ivs, trim=10)
        intr, cost = calibrate_accelerometer(means, opts.gravity)
        cost_per = cost / len(ivs)
        if best is None or cost_per < best[0]:
            best = (cost_per, k, ivs, intr)
    if best is None:
        raise ValueError(
            f"no threshold multiplier produced >= {opts.min_intervals} static intervals")
    _, k, ivs, acc_intr = best
    gyro_intr, gyro_cost = calibrate_gyroscope(imu, ivs, acc_intr, opts.gravity)
    return acc_intr, gyro_intr, {
        "threshold_mult": k, "num_intervals": len(ivs), "gyro_cost": gyro_cost}
