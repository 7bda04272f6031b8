import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import BSpline
from scipy.spatial.transform import Rotation

from openimucameracalibrator_tpu.ops import lie, spline


@pytest.mark.parametrize("order", [3, 4, 6])
def test_blending_matrix_matches_scipy(order):
    """Our polynomial basis must equal scipy's uniform B-spline basis."""
    M = spline.blending_matrix(order)
    k = order - 1
    nk = 12
    knots = np.arange(-k, nk + k + 1, dtype=float)
    us = np.linspace(0.01, 0.99, 7)
    seg = 4  # evaluate inside segment [4, 5): control pts seg..seg+order-1
    for u in us:
        t = seg + u
        upow = u ** np.arange(order)
        weights = M @ upow  # (order,) weight of control point seg+j
        for j in range(order):
            c = np.zeros(nk + k)
            c[seg + j] = 1.0
            want = BSpline(knots, c, k)(t)
            np.testing.assert_allclose(weights[j], want, atol=1e-12)


@pytest.mark.parametrize("order", [3, 6])
def test_partition_of_unity(order):
    M = spline.blending_matrix(order)
    Mc = spline.blending_matrix(order, cumulative=True)
    for u in np.linspace(0, 1, 9):
        upow = u ** np.arange(order)
        np.testing.assert_allclose(np.sum(M @ upow), 1.0, atol=1e-12)
        np.testing.assert_allclose((Mc @ upow)[0], 1.0, atol=1e-12)


def test_r3_eval_derivatives_match_finite_diff(rng):
    order, dt = 6, 0.1
    knots = jnp.array(rng.normal(size=(order, 3)))
    u = jnp.array(0.37)
    h = 1e-6
    v0 = spline.r3_eval(knots, u, dt, 0)
    v1 = spline.r3_eval(knots, u, dt, 1)
    v2 = spline.r3_eval(knots, u, dt, 2)
    fd1 = (spline.r3_eval(knots, u + h, dt, 0) - spline.r3_eval(knots, u - h, dt, 0)) / (2 * h * dt)
    fd2 = (spline.r3_eval(knots, u + h, dt, 1) - spline.r3_eval(knots, u - h, dt, 1)) / (2 * h * dt)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(fd1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(fd2), atol=1e-5)


def test_so3_eval_interpolates_constant_rotation(rng):
    """All-equal knots -> spline == that rotation everywhere."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    qwin = jnp.array(np.tile(q, (6, 1)))
    for u in [0.0, 0.3, 0.9]:
        got = np.asarray(spline.so3_eval(qwin, jnp.array(u)))
        assert min(np.linalg.norm(got - q), np.linalg.norm(got + q)) < 1e-10


def test_so3_spline_constant_velocity(rng):
    """Knots on a constant-rate rotation -> omega == that rate exactly.

    A cumulative B-spline reproduces constant-velocity curves on the group.
    """
    dt = 0.1
    omega_true = np.array([0.4, -0.2, 0.7])
    n = 10
    qk = []
    q = np.array([1.0, 0, 0, 0])
    for i in range(n):
        qk.append(q)
        q = np.asarray(lie.quat_multiply(jnp.array(q), lie.so3_exp(jnp.array(omega_true * dt))))
    qknots = jnp.array(np.stack(qk))
    t = jnp.array([0.21, 0.33, 0.40])
    qs, omegas = spline.so3_vel_batch(qknots, t, 0.0, dt, order=6)
    np.testing.assert_allclose(np.asarray(omegas), np.tile(omega_true, (3, 1)), atol=1e-8)


def test_so3_vel_matches_numeric_diff(rng):
    qwin = jnp.array(np.stack([
        np.asarray(lie.so3_exp(jnp.array(rng.normal(size=3) * 0.3))) for _ in range(6)
    ]))
    dt = 0.05
    u = jnp.array(0.43)
    q, omega = spline.so3_vel(qwin, u, dt)
    h = 1e-6
    qp = spline.so3_eval(qwin, u + h)
    qm = spline.so3_eval(qwin, u - h)
    dq = (np.asarray(qp) - np.asarray(qm)) / (2 * h * dt)
    om_num = 2.0 * np.asarray(lie.quat_multiply(lie.quat_conjugate(q), jnp.array(dq)))[1:4]
    np.testing.assert_allclose(np.asarray(omega), om_num, atol=1e-6)


def test_so3_accel_matches_numeric_diff(rng):
    qwin = jnp.array(np.stack([
        np.asarray(lie.so3_exp(jnp.array(rng.normal(size=3) * 0.3))) for _ in range(6)
    ]))
    dt = 0.05
    u = jnp.array(0.43)
    q, omega, domega = spline.so3_accel(qwin, u, dt)
    h = 1e-6
    _, op = spline.so3_vel(qwin, u + h, dt)
    _, om = spline.so3_vel(qwin, u - h, dt)
    fd = (np.asarray(op) - np.asarray(om)) / (2 * h * dt)
    np.testing.assert_allclose(np.asarray(domega), fd, atol=1e-5)


def test_spline_coords_and_gather():
    knots = jnp.arange(20, dtype=jnp.float64)[:, None]
    # Valid support for 20 knots, order 6, dt=0.1 is t in [0, 1.5).
    t = jnp.array([0.05, 0.55, 1.45])
    idx, u = spline.spline_coords(t, 0.0, 0.1, 20, 6)
    np.testing.assert_array_equal(np.asarray(idx), [0, 5, 14])
    np.testing.assert_allclose(np.asarray(u), [0.5, 0.5, 0.5], atol=1e-9)
    w = spline.gather_window(knots, idx, 6)
    assert w.shape == (3, 6, 1)
    np.testing.assert_allclose(np.asarray(w[1, :, 0]), np.arange(5, 11))


def test_batch_eval_grad_wrt_knots(rng):
    """Jacobian of batched spline eval w.r.t. knots is finite and sparse."""
    qknots = jnp.array(np.stack([
        np.asarray(lie.so3_exp(jnp.array(rng.normal(size=3) * 0.2))) for _ in range(12)
    ]))

    def f(qk):
        qs = spline.so3_eval_batch(qk, jnp.array([0.31]), 0.0, 0.1, order=6)
        return jnp.sum(qs)

    g = np.asarray(jax.grad(f)(qknots))
    assert np.isfinite(g).all()
    # Measurement at t=0.31 -> segment 3, touches knots 3..8 only.
    assert np.abs(g[:3]).max() == 0
    assert np.abs(g[9:]).max() == 0
    assert np.abs(g[3:9]).max() > 0
