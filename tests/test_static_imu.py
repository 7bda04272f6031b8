"""Static multi-pose IMU intrinsic calibration on synthetic imu_tk data."""

import numpy as np

from openimucameracalibrator_tpu.core import static_imu_calibrator
from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.utils.types import ImuData
import jax.numpy as jnp

G = 9.81

TRUE_T_A = np.array([[1.0, -0.01, 0.004], [0.0, 1.0, -0.006], [0.0, 0.0, 1.0]])
TRUE_K_A = np.array([1.02, 0.98, 1.01])
TRUE_B_A = np.array([0.15, -0.12, 0.2])
TRUE_T_G = np.array([[1.0, -0.005, 0.003], [0.006, 1.0, -0.004], [-0.002, 0.008, 1.0]])
TRUE_K_G = np.array([1.015, 0.985, 1.005])
TRUE_B_G = np.array([0.01, -0.008, 0.012])


def make_multipose_data(rng, n_poses=16, rate=100.0,
                        static_s=4.0, motion_s=2.0, init_static_s=6.0):
    """Random tumble sequence: static poses joined by smooth rotations.

    Raw readings follow the imu_tk model: raw = (T K)^{-1} true + b.
    """
    TKa_inv = np.linalg.inv(TRUE_T_A @ np.diag(TRUE_K_A))
    TKg_inv = np.linalg.inv(TRUE_T_G @ np.diag(TRUE_K_G))
    dt = 1.0 / rate
    g_w = np.array([0.0, 0.0, G])

    q = np.array([1.0, 0, 0, 0])
    t_all, acc_all, gyr_all = [], [], []
    t = 0.0

    def emit_static(duration, q):
        nonlocal t
        n = int(duration * rate)
        g_b = np.asarray(lie.quat_rotate(lie.quat_conjugate(jnp.asarray(q)), jnp.asarray(g_w)))
        for _ in range(n):
            a_true = g_b
            w_true = np.zeros(3)
            acc_all.append(TKa_inv @ a_true + TRUE_B_A + rng.normal(size=3) * 0.004)
            gyr_all.append(TKg_inv @ w_true + TRUE_B_G + rng.normal(size=3) * 0.001)
            t_all.append(t)
            t += dt

    def emit_motion(duration, q):
        nonlocal t
        n = int(duration * rate)
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        # Smooth bump rotation profile.
        for k in range(n):
            s = np.sin(np.pi * k / n) ** 2
            w_true = axis * s * 1.6
            g_b = np.asarray(lie.quat_rotate(lie.quat_conjugate(jnp.asarray(q)), jnp.asarray(g_w)))
            a_true = g_b  # quasi-static tumble (rotation about the sensor)
            acc_all.append(TKa_inv @ a_true + TRUE_B_A + rng.normal(size=3) * 0.004)
            gyr_all.append(TKg_inv @ w_true + TRUE_B_G + rng.normal(size=3) * 0.001)
            t_all.append(t)
            t += dt
            q = np.asarray(lie.quat_multiply(jnp.asarray(q), lie.so3_exp(jnp.asarray(w_true * dt))))
        return q

    emit_static(init_static_s, q)
    for _ in range(n_poses - 1):
        q = emit_motion(motion_s, q)
        emit_static(static_s, q)
    return ImuData(times=np.asarray(t_all), accel=np.asarray(acc_all),
                   gyro=np.asarray(gyr_all))


def test_static_imu_calibration(rng):
    imu = make_multipose_data(rng)
    acc, gyr, info = static_imu_calibrator.calibrate(
        imu, static_imu_calibrator.StaticImuCalibratorOptions(
            init_static_duration_s=5.0, min_intervals=12,
            min_interval_samples=150))
    assert info["num_intervals"] >= 12
    np.testing.assert_allclose(acc.scale, TRUE_K_A, atol=5e-3)
    np.testing.assert_allclose(acc.bias, TRUE_B_A, atol=2e-2)
    np.testing.assert_allclose(acc.misalignment, TRUE_T_A, atol=5e-3)
    np.testing.assert_allclose(gyr.scale, TRUE_K_G, atol=1e-2)
    np.testing.assert_allclose(gyr.bias, TRUE_B_G, atol=2e-3)
    np.testing.assert_allclose(gyr.misalignment, TRUE_T_G, atol=1e-2)
    # Calibrated accel readings must have norm g at static poses.
    cal = acc.unbias_normalize(imu.accel[:400])
    np.testing.assert_allclose(np.linalg.norm(cal, axis=1).mean(), G, atol=0.02)
