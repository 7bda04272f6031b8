import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from openimucameracalibrator_tpu.ops import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_multiply_matches_scipy(rng):
    qa, qb = random_quats(rng, 16), random_quats(rng, 16)
    got = np.asarray(lie.quat_multiply(jnp.array(qa), jnp.array(qb)))
    # scipy uses (x, y, z, w)
    ra = Rotation.from_quat(qa[:, [1, 2, 3, 0]])
    rb = Rotation.from_quat(qb[:, [1, 2, 3, 0]])
    want = (ra * rb).as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 32)
    v = rng.normal(size=(32, 3))
    R = np.asarray(lie.quat_to_matrix(jnp.array(q)))
    want = np.einsum("nij,nj->ni", R, v)
    got = np.asarray(lie.quat_rotate(jnp.array(q), jnp.array(v)))
    np.testing.assert_allclose(got, want, atol=1e-12)
    # And against scipy.
    want2 = Rotation.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
    np.testing.assert_allclose(got, want2, atol=1e-12)


def test_matrix_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q[q[:, 0] < 0] *= -1
    R = np.asarray(lie.quat_to_matrix(jnp.array(q)))
    q2 = np.asarray(lie.matrix_to_quat(jnp.array(R)))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_exp_log_roundtrip(rng):
    phi = rng.normal(size=(64, 3))
    q = lie.so3_exp(jnp.array(phi))
    phi2 = np.asarray(lie.so3_log(q))
    # Only valid for |phi| < pi
    mask = np.linalg.norm(phi, axis=-1) < np.pi
    np.testing.assert_allclose(phi2[mask], phi[mask], atol=1e-10)


def test_exp_matches_scipy(rng):
    phi = rng.normal(size=(32, 3))
    got = np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.array(phi))))
    want = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_exp_log_small_angles_and_grad():
    phi = jnp.array([1e-12, -2e-13, 5e-13], dtype=jnp.float64)
    q = lie.so3_exp(phi)
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_allclose(np.asarray(lie.so3_log(q)), np.asarray(phi), atol=1e-15)
    # Gradients finite at exactly zero.
    g = jax.jacobian(lie.so3_exp)(jnp.zeros(3, jnp.float64))
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.jacobian(lie.so3_log)(lie.quat_identity(jnp.float64))
    assert np.isfinite(np.asarray(g2)).all()


def test_slerp_endpoints_and_midpoint(rng):
    q0, q1 = jnp.array(random_quats(rng, 8)), jnp.array(random_quats(rng, 8))
    np.testing.assert_allclose(np.asarray(lie.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-12)
    e1 = np.asarray(lie.quat_slerp(q0, q1, 1.0))
    w1 = np.asarray(q1)
    sign = np.sign(np.sum(e1 * w1, axis=-1, keepdims=True))
    np.testing.assert_allclose(e1, w1 * sign, atol=1e-10)


def test_se3_compose_inverse(rng):
    qa, qb = jnp.array(random_quats(rng, 8)), jnp.array(random_quats(rng, 8))
    ta, tb = jnp.array(rng.normal(size=(8, 3))), jnp.array(rng.normal(size=(8, 3)))
    p = jnp.array(rng.normal(size=(8, 3)))
    qc, tc = lie.se3_compose(qa, ta, qb, tb)
    want = lie.se3_act(qa, ta, lie.se3_act(qb, tb, p))
    got = lie.se3_act(qc, tc, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    qi, ti = lie.se3_inverse(qa, ta)
    back = lie.se3_act(qi, ti, lie.se3_act(qa, ta, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-12)


def test_boxplus_boxminus(rng):
    q = jnp.array(random_quats(rng, 8))
    d = jnp.array(rng.normal(size=(8, 3)) * 0.3)
    q2 = lie.quat_boxplus(q, d)
    d2 = lie.quat_boxminus(q2, q)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-10)
