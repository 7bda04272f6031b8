"""Batched Lie-group operations on SO(3)/SE(3), quaternion-based.

TPU-native replacement for the Sophus usage in the reference
(/root/reference third_party/Sophus, used throughout
include/OpenCameraCalibrator/basalt_spline/ceres_spline_helper.h and
src/core/spline_trajectory_estimator*). Everything here is a pure function
over ``jnp`` arrays with leading batch dimensions, safe under ``jit``,
``vmap``, ``grad`` (small-angle branches are Taylor-expanded and NaN-free
under autodiff).

Conventions
-----------
* Quaternions are ``(..., 4)`` arrays ordered ``(w, x, y, z)`` (Hamilton).
* ``quat_rotate(q, v) == R(q) @ v`` (active rotation).
* SE(3) is carried as a ``(quat, trans)`` pair; ``se3_act`` maps points by
  ``R v + t``.
* ``so3_exp``/``so3_log`` map axis-angle tangent vectors (rad) to/from unit
  quaternions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-8


def _safe_norm(v: jax.Array, axis: int = -1):
    """Norm with a gradient that is finite at 0 (returns 0 there)."""
    sq = jnp.sum(v * v, axis=axis)
    # Avoid sqrt(0) gradient NaN: clamp under the radical, zero the output.
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, norm, 0.0)


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product q ⊗ p, batched over leading dims."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse for possibly non-unit quaternions."""
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q: R(q) v.

    Uses the expanded 15-mul form rather than q⊗v⊗q* (fewer flops, VPU
    friendly).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w,x,y,z), Shepperd's method.

    Branch-free (computes all four candidates and selects the best-
    conditioned one), so it is safe under vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate squared magnitudes (4w², 4x², 4y², 4z²), each >= 0 for
    # a valid rotation; pick the largest for numerical stability.
    c0 = 1.0 + tr
    c1 = 1.0 + m00 - m11 - m22
    c2 = 1.0 - m00 + m11 - m22
    c3 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    idx = jnp.argmax(cands, axis=-1)

    def from_w():
        s = jnp.sqrt(jnp.maximum(c0, _SMALL)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def from_x():
        s = jnp.sqrt(jnp.maximum(c1, _SMALL)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def from_y():
        s = jnp.sqrt(jnp.maximum(c2, _SMALL)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def from_z():
        s = jnp.sqrt(jnp.maximum(c3, _SMALL)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    qs = jnp.stack([from_w(), from_x(), from_y(), from_z()], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return quat_normalize(q)


def so3_exp(phi: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> unit quaternion, Taylor-safe at 0."""
    theta = _safe_norm(phi)[..., None]
    half = 0.5 * theta
    small = theta < 1e-4
    # sin(x/2)/x and cos(x/2); Taylor for tiny angles.
    k = jnp.where(
        small,
        0.5 - theta * theta / 48.0,
        jnp.sin(half) / jnp.where(theta > 0, theta, 1.0),
    )
    w = jnp.cos(half)
    return jnp.concatenate([w, k * phi], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> axis-angle (..., 3), in (-pi, pi], Taylor-safe."""
    w = q[..., 0:1]
    v = q[..., 1:4]
    # Handle double cover: force w >= 0 so the angle is minimal.
    sgn = jnp.where(w < 0, -1.0, 1.0)
    w = w * sgn
    v = v * sgn
    vn = _safe_norm(v)[..., None]
    small = vn < 1e-6
    # theta = 2 atan2(|v|, w); phi = theta * v/|v|
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(w, 0.5) * (1.0 + vn * vn / (3.0 * jnp.maximum(w * w, 0.25))),
        theta / jnp.where(vn > 0, vn, 1.0),
    )
    return scale * v


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation q0 -> q1 at fraction(s) t in [0, 1]."""
    t = jnp.asarray(t)[..., None]
    # Shortest arc.
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    rel = quat_multiply(quat_conjugate(q0), q1)
    return quat_multiply(q0, so3_exp(t * so3_log(rel)))


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SE(3) as (quat, trans) pairs
# ---------------------------------------------------------------------------

def se3_act(q: jax.Array, t: jax.Array, p: jax.Array) -> jax.Array:
    """Apply rigid transform: R(q) p + t."""
    return quat_rotate(q, p) + t


def se3_compose(qa, ta, qb, tb):
    """T_a * T_b -> (q, t)."""
    return quat_multiply(qa, qb), quat_rotate(qa, tb) + ta


def se3_inverse(q, t):
    qi = quat_conjugate(q)
    return qi, -quat_rotate(qi, t)


def se3_exp(xi: jax.Array):
    """(..., 6) tangent (rho, phi) -> (q, t) with exact V matrix."""
    rho, phi = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    theta = _safe_norm(phi)[..., None, None]
    K = skew(phi)
    small = theta < 1e-4
    t2 = theta * theta
    A = jnp.where(small, 0.5 - t2 / 24.0, (1 - jnp.cos(jnp.where(small, 1.0, theta))) / jnp.where(small, 1.0, t2))
    B = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (jnp.where(small, 1.0, theta) - jnp.sin(jnp.where(small, 1.0, theta))) / jnp.where(small, 1.0, t2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + A * K + B * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return q, t


def quat_boxplus(q: jax.Array, delta: jax.Array) -> jax.Array:
    """Right-retraction on SO(3): q ⊞ δ = q ⊗ exp(δ).

    This is the JAX analog of the reference's LieLocalParameterization
    (include/OpenCameraCalibrator/basalt_spline/ceres_local_param.h:73-115),
    used by the LM solver for quaternion-valued parameter blocks.
    """
    return quat_multiply(q, so3_exp(delta))


def quat_boxminus(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """log(qb^{-1} ⊗ qa): the δ with qb ⊞ δ = qa."""
    return so3_log(quat_multiply(quat_conjugate(qb), qa))
