import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.ops import allan, imu_integration, intervals, lie, sew
from openimucameracalibrator_tpu.utils.types import ImuData


def test_rk4_integration_constant_rate():
    dt = 0.005
    omega = np.array([0.3, -0.5, 0.8])
    n = 400
    times = jnp.arange(n) * dt
    gyro = jnp.tile(jnp.array(omega), (n, 1))
    q = imu_integration.integrate_gyro(times, gyro)
    want = lie.so3_exp(jnp.array(omega * dt * (n - 1)))
    err = np.linalg.norm(np.asarray(lie.quat_boxminus(q, want)))
    assert err < 1e-8, err


def test_rk4_integration_varying_rate(rng):
    """Compare against dense Euler integration at 100x substeps."""
    dt = 0.01
    n = 200
    times = np.arange(n) * dt
    gyro = 0.8 * np.stack([np.sin(0.9 * times), np.cos(1.3 * times), np.sin(0.4 * times + 1)], -1)
    q = imu_integration.integrate_gyro(jnp.asarray(times), jnp.asarray(gyro))
    # Fine reference: slerp-free fine Euler with interpolated rates.
    tf = np.arange(0, times[-1], dt / 100)
    gf = np.stack([np.interp(tf, times, gyro[:, k]) for k in range(3)], -1)
    qq = np.array([1.0, 0, 0, 0])
    for k in range(len(tf) - 1):
        w = 0.5 * (gf[k] + gf[k + 1])
        qq = np.asarray(lie.quat_multiply(jnp.asarray(qq), lie.so3_exp(jnp.asarray(w * dt / 100))))
    err = np.linalg.norm(np.asarray(lie.quat_boxminus(q, jnp.asarray(qq))))
    assert err < 5e-4, err


def test_static_interval_detection(rng):
    rate = 100.0
    # 3 static poses separated by motion.
    segs = []
    for k in range(3):
        segs.append(np.tile([0.0, 0.0, 9.81], (500, 1)) + rng.normal(size=(500, 3)) * 0.01)
        segs.append(rng.normal(size=(200, 3)) * 2.0 + [0, 0, 9.81])
    acc = np.concatenate(segs[:-1])
    ivs, var = intervals.static_intervals(acc, threshold=0.01, half_window=25,
                                          min_length=100)
    assert len(ivs) == 3
    for iv, start in zip(ivs, [0, 700, 1400]):
        assert abs(iv.start - start) < 60, (iv.start, start)


def test_allan_white_noise_recovery(rng):
    rate = 200.0
    n = 200000
    sigma = 0.02  # white noise per sample
    x = rng.normal(size=(n, 3)) * sigma
    res = allan.analyze(x, rate)
    # White noise density N = sigma * sqrt(dt) = sigma / sqrt(rate).
    want = sigma / np.sqrt(rate)
    np.testing.assert_allclose(res.white_noise_density, want, rtol=0.15)


def test_sew_knot_spacing_tracks_bandwidth(rng):
    rate = 200.0
    t = np.arange(0, 60, 1 / rate)
    slow = np.stack([np.sin(2 * np.pi * 0.5 * t)] * 3, -1) + rng.normal(size=(len(t), 3)) * 1e-3
    fast = np.stack([np.sin(2 * np.pi * 8.0 * t)] * 3, -1) + rng.normal(size=(len(t), 3)) * 1e-3
    dt_slow, var_slow = sew.knot_spacing_and_variance(slow, t, 0.99)
    dt_fast, var_fast = sew.knot_spacing_and_variance(fast, t, 0.99)
    assert dt_slow > dt_fast  # slower signal allows wider knots
    assert 0.01 <= dt_fast <= dt_slow <= 0.2


def test_sew_compute_full(rng):
    rate = 200.0
    t = np.arange(0, 30, 1 / rate)
    gyro = 0.5 * np.stack([np.sin(2 * np.pi * 1.1 * t), np.cos(2 * np.pi * 0.7 * t),
                           np.sin(2 * np.pi * 1.7 * t)], -1) + rng.normal(size=(len(t), 3)) * 0.002
    accel = 2.0 * np.stack([np.sin(2 * np.pi * 0.9 * t)] * 3, -1) + rng.normal(size=(len(t), 3)) * 0.02
    imu = ImuData(times=t, accel=accel, gyro=gyro)
    out = sew.compute_sew(imu, cam_fps=30.0)
    assert 0.01 <= out.dt_so3 <= 0.2
    assert 0.01 <= out.dt_r3 <= 0.15
    assert out.std_so3 > 0 and out.std_r3 > 0
    assert out.cam_fps == 30.0


def test_static_bias_estimation(rng):
    rate = 100.0
    n = 3000
    bias_a = np.array([0.05, -0.02, 0.1])
    bias_g = np.array([0.01, 0.002, -0.005])
    accel = np.tile([0, 0, 9.81], (n, 1)) + bias_a + rng.normal(size=(n, 3)) * 0.01
    gyro = np.tile([0.0, 0, 0], (n, 1)) + bias_g + rng.normal(size=(n, 3)) * 0.002
    imu = ImuData(times=np.arange(n) / rate, accel=accel, gyro=gyro)
    ba, bg, source = sew.estimate_static_biases(imu)
    assert source == "static_interval"
    np.testing.assert_allclose(ba, bias_a, atol=2e-3)
    np.testing.assert_allclose(bg, bias_g, atol=2e-4)


def test_static_bias_dynamic_recording_guard(rng):
    """A dynamic recording has no static interval: biases fall back to
    zero with a warning instead of absorbing motion means (VERDICT r1)."""
    import warnings
    rate, n = 100.0, 2000
    t = np.arange(n) / rate
    gyro = 0.5 * np.stack([np.sin(2 * np.pi * 1.1 * t)] * 3, -1)
    accel = np.tile([0, 0, 9.81], (n, 1)) + 2.0 * np.stack(
        [np.cos(2 * np.pi * 0.7 * t)] * 3, -1)
    imu = ImuData(times=t, accel=accel, gyro=gyro)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ba, bg, source = sew.estimate_static_biases(imu)
    assert source == "none"
    assert np.all(ba == 0) and np.all(bg == 0)
    assert any("static" in str(w.message) for w in rec)


def test_static_bias_uses_static_segment(rng):
    """Mixed recording: the estimate must come from the static span only."""
    rate = 100.0
    bias_g = np.array([0.01, -0.004, 0.006])
    t = np.arange(4000) / rate
    gyro = np.tile(bias_g, (4000, 1)) + rng.normal(size=(4000, 3)) * 0.002
    # First half spins; second half is static.
    gyro[:2000] += 0.6 * np.sin(2 * np.pi * 1.3 * t[:2000])[:, None]
    accel = np.tile([0, 0, 9.81], (4000, 1)) + rng.normal(size=(4000, 3)) * 0.01
    accel[:2000, 0] += 3.0 * np.sin(2 * np.pi * 0.9 * t[:2000])
    imu = ImuData(times=t, accel=accel, gyro=gyro)
    ba, bg, _ = sew.estimate_static_biases(imu)
    np.testing.assert_allclose(bg, bias_g, atol=5e-4)
    assert np.all(np.abs(ba) < 5e-3)
