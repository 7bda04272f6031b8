"""Batched pose initialization: homography DLT, Zhang focal init, PnP, RANSAC.

TPU-native replacement for the reference's TheiaSfM RANSAC pose solvers
(/root/reference src/utils/intrinsic_initializer.cc:36-134 — P4P-focal and
radial-P4P uncalibrated pose — and src/core/pose_estimator.cc:54-90 —
calibrated DLS PnP). Design differences:

* The target is planar, so uncalibrated initialization uses normalized-DLT
  homographies + Zhang's closed-form focal estimate over all views at once
  (batched SVDs), instead of per-view minimal solvers.
* Calibrated pose uses 6-point DLT inside a fixed-size hypothesis batch:
  RANSAC is ``vmap`` over K random subsets + argmax inlier count — no
  data-dependent loop trip counts, so the whole thing jits.

All functions take a ``valid`` mask alongside points so padded (static
shape) per-view corner arrays work under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openimucameracalibrator_tpu.ops import lie


def _masked_normalization(x: jax.Array, mask: jax.Array):
    """Hartley normalization stats over masked 2D points: (centroid, scale)."""
    w = mask[..., None]
    n = jnp.maximum(jnp.sum(mask, -1), 1.0)[..., None]
    c = jnp.sum(x * w, axis=-2) / n
    d = jnp.sqrt(jnp.sum((x - c[..., None, :]) ** 2, -1) + 1e-12)
    mean_d = jnp.sum(d * mask, -1) / n[..., 0]
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-9)
    return c, s


def homography_dlt(obj_xy: jax.Array, img_xy: jax.Array, mask: jax.Array) -> jax.Array:
    """Normalized DLT homography: obj plane (z=0) -> image. Batched.

    obj_xy, img_xy: (..., P, 2); mask: (..., P). Returns (..., 3, 3) with
    H[2,2] scaled so ||H||_F = 1 (sign fixed so H[2,2] >= 0).
    """
    co, so = _masked_normalization(obj_xy, mask)
    ci, si = _masked_normalization(img_xy, mask)
    o = (obj_xy - co[..., None, :]) * so[..., None, None]
    p = (img_xy - ci[..., None, :]) * si[..., None, None]
    x, y = o[..., 0], o[..., 1]
    u, v = p[..., 0], p[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1 * mask[..., None], r2 * mask[..., None]], axis=-2)
    # h = right singular vector of the smallest singular value. With the
    # minimal 4-point system A is (8, 9) and full_matrices=False would drop
    # the nullspace vector entirely — pad to at least 9 rows.
    if A.shape[-2] < A.shape[-1]:
        pad = [(0, 0)] * (A.ndim - 2) + [(0, A.shape[-1] - A.shape[-2]), (0, 0)]
        A = jnp.pad(A, pad)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    h = vt[..., -1, :]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # Denormalize: H = Ti^{-1} Hn To
    def tmat(c, s):
        z = jnp.zeros_like(s)
        o_ = jnp.ones_like(s)
        return jnp.stack([
            jnp.stack([s, z, -s * c[..., 0]], -1),
            jnp.stack([z, s, -s * c[..., 1]], -1),
            jnp.stack([z, z, o_], -1)], -2)

    To = tmat(co, so)
    Ti = tmat(ci, si)
    H = jnp.linalg.solve(Ti, Hn @ To)
    nrm = jnp.linalg.norm(H, axis=(-2, -1), keepdims=True)
    H = H / nrm
    sign = jnp.where(H[..., 2:3, 2:3] < 0, -1.0, 1.0)
    return H * sign


def homography_ls(obj_xy: jax.Array, img_xy: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """Normalized least-squares homography with h33 = 1. Batched.

    Same contract as :func:`homography_dlt` (obj plane -> image,
    ||H||_F = 1, H[2,2] >= 0) but solved through the 8x8 normal equations
    of the inhomogeneous DLT system instead of an SVD nullspace. On TPU
    the batched small SVD is iterative and dominates the fused video-
    detection program (~1000 (32,9) SVDs per 16-frame block); the 8x8
    Cholesky solve is three tiny matmuls. After Hartley normalization
    h33 = 0 only for quadrilaterals through the centroid-scaled origin's
    horizon — not reachable for physical marker/board views; degenerate
    inputs yield non-finite H, which every caller gates on.
    """
    co, so = _masked_normalization(obj_xy, mask)
    ci, si = _masked_normalization(img_xy, mask)
    o = (obj_xy - co[..., None, :]) * so[..., None, None]
    p = (img_xy - ci[..., None, :]) * si[..., None, None]
    x, y = o[..., 0], o[..., 1]
    u, v = p[..., 0], p[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], -1)
    A = jnp.concatenate([r1 * mask[..., None], r2 * mask[..., None]], axis=-2)
    b = jnp.concatenate([u * mask, v * mask], axis=-1)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    AtA = AtA + 1e-9 * jnp.eye(8, dtype=A.dtype)
    Atb = jnp.einsum("...pi,...p->...i", A, b)
    h = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    Hn = jnp.concatenate([h, jnp.ones(h.shape[:-1] + (1,), h.dtype)],
                         -1).reshape(h.shape[:-1] + (3, 3))

    def tmat(c, s):
        z = jnp.zeros_like(s)
        o_ = jnp.ones_like(s)
        return jnp.stack([
            jnp.stack([s, z, -s * c[..., 0]], -1),
            jnp.stack([z, s, -s * c[..., 1]], -1),
            jnp.stack([z, z, o_], -1)], -2)

    To = tmat(co, so)
    Ti = tmat(ci, si)
    H = jnp.linalg.solve(Ti, Hn @ To)
    nrm = jnp.linalg.norm(H, axis=(-2, -1), keepdims=True)
    H = H / nrm
    sign = jnp.where(H[..., 2:3, 2:3] < 0, -1.0, 1.0)
    return H * sign


def zhang_focal(Hs: jax.Array, valid: jax.Array) -> jax.Array:
    """Closed-form shared focal from view homographies (Zhang 2000).

    Homographies must be expressed with pixel coordinates centered on the
    assumed principal point. Returns a scalar focal estimate (median over
    both constraint families across valid views). This replaces the
    reference's P4P-focal RANSAC initialization
    (intrinsic_initializer.cc:36-67) for the planar-target case.
    """
    h1 = Hs[..., :, 0]
    h2 = Hs[..., :, 1]
    # Constraint 1: h1' w h2 = 0, w = diag(1/f^2, 1/f^2, 1)
    num1 = -(h1[..., 2] * h2[..., 2])
    den1 = h1[..., 0] * h2[..., 0] + h1[..., 1] * h2[..., 1]
    inv_f2_a = num1 / jnp.where(jnp.abs(den1) > 1e-12, den1, 1e-12)
    # Constraint 2: h1' w h1 = h2' w h2
    num2 = h2[..., 2] ** 2 - h1[..., 2] ** 2
    den2 = (h1[..., 0] ** 2 + h1[..., 1] ** 2 - h2[..., 0] ** 2 - h2[..., 1] ** 2)
    inv_f2_b = num2 / jnp.where(jnp.abs(den2) > 1e-12, den2, 1e-12)
    cands = jnp.concatenate([inv_f2_a, inv_f2_b], axis=-1)
    ok = jnp.concatenate([valid, valid], axis=-1) & (cands > 1e-12) & jnp.isfinite(cands)
    # Masked median: sort with invalid pushed to +inf, index by count/2.
    vals = jnp.where(ok, cands, jnp.inf)
    vals = jnp.sort(vals, axis=-1)
    k = jnp.maximum(jnp.sum(ok, -1), 1)
    med = jnp.take_along_axis(vals, ((k - 1) // 2)[..., None], axis=-1)[..., 0]
    return 1.0 / jnp.sqrt(jnp.maximum(med, 1e-12))


def pose_from_homography(H: jax.Array, f, cc: jax.Array):
    """Decompose plane homography into (q_cam_board, t) given focal/pp.

    Returns the transform mapping board coordinates into the camera frame.
    """
    Kinv_diag = jnp.stack([1.0 / f, 1.0 / f, jnp.ones_like(f)], -1)
    Hc = H.at[..., 0, :].add(-cc[..., 0, None] * H[..., 2, :])
    Hc = Hc.at[..., 1, :].add(-cc[..., 1, None] * H[..., 2, :])
    M = Kinv_diag[..., :, None] * Hc
    m1, m2, m3 = M[..., :, 0], M[..., :, 1], M[..., :, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(m1, axis=-1), 1e-12)
    # Cheirality: board must be in front (t_z > 0 for a board at z=0 plane
    # seen from the camera). Flip the homography sign if not.
    sgn = jnp.where(m3[..., 2] * lam < 0, -1.0, 1.0)[..., None]
    r1 = m1 * lam[..., None] * sgn
    r2 = m2 * lam[..., None] * sgn
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=-1)
    # Project onto SO(3).
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate([jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]),
                         det[..., None]], -1)
    Rp = (U * D[..., None, :]) @ Vt
    t = m3 * lam[..., None] * sgn
    return lie.matrix_to_quat(Rp), t


def pnp_dlt(points3d: jax.Array, bearings_xy: jax.Array, mask: jax.Array):
    """Calibrated DLT PnP from normalized image coords (z=1 plane).

    points3d: (..., P, 3); bearings_xy: (..., P, 2); mask: (..., P).
    Returns (q_cam_world, t_cam_world): X_cam = R X + t.
    Needs >= 6 well-spread points (calibration boards have plenty).
    """
    X, Y, Z = points3d[..., 0], points3d[..., 1], points3d[..., 2]
    x, y = bearings_xy[..., 0], bearings_xy[..., 1]
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, Z, one, zero, zero, zero, zero, -x * X, -x * Y, -x * Z, -x], -1)
    r2 = jnp.stack([zero, zero, zero, zero, X, Y, Z, one, -y * X, -y * Y, -y * Z, -y], -1)
    A = jnp.concatenate([r1 * mask[..., None], r2 * mask[..., None]], axis=-2)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    p = vt[..., -1, :].reshape(vt.shape[:-2] + (3, 4))
    # The DLT solution is +-lambda [R|t]; the correct sign makes the
    # rotation part have positive determinant (a 3x3 sign flip negates it).
    s = jnp.sign(jnp.linalg.det(p[..., :3]))[..., None, None]
    p = p * jnp.where(s == 0, 1.0, s)
    R_raw = p[..., :3]
    t_raw = p[..., 3]
    U, S, Vt = jnp.linalg.svd(R_raw)
    scale = 3.0 / jnp.maximum(jnp.sum(S, -1), 1e-12)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = (U * D[..., None, :]) @ Vt
    t = t_raw * scale[..., None]
    return lie.matrix_to_quat(R), t


def reprojection_errors_normalized(q, t, points3d, bearings_xy, mask):
    """Squared reprojection error on the normalized image plane."""
    pc = lie.quat_rotate(q[..., None, :], points3d) + t[..., None, :]
    z = pc[..., 2]
    proj = pc[..., :2] / jnp.where(jnp.abs(z[..., None]) > 1e-9, z[..., None], 1e-9)
    err2 = jnp.sum((proj - bearings_xy) ** 2, -1)
    return jnp.where(mask & (z > 1e-6), err2, jnp.inf)


def ransac_pnp_planar(points3d: jax.Array, bearings_xy: jax.Array, mask: jax.Array,
                      key: jax.Array, num_hypotheses: int = 128, sample_size: int = 6,
                      inlier_thresh: float = 0.01):
    """RANSAC pose for PLANAR targets (z == 0) from normalized image coords.

    The 3D DLT is degenerate for coplanar points, so hypotheses come from
    minimal homographies (board plane -> normalized image plane) decomposed
    with f=1, pp=0. Same fixed-size batched structure as :func:`ransac_pnp`.
    """
    P = points3d.shape[-2]
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (num_hypotheses, P)) + 1e-12) + 1e-12)
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)
    obj_s = jnp.take(points3d[:, :2], idx, axis=0)
    brg_s = jnp.take(bearings_xy, idx, axis=0)
    msk_s = jnp.take(mask, idx, axis=0).astype(bearings_xy.dtype)
    Hs = homography_dlt(obj_s, brg_s, msk_s)
    f1 = jnp.ones((num_hypotheses,), bearings_xy.dtype)
    cc0 = jnp.zeros((num_hypotheses, 2), bearings_xy.dtype)
    qs, ts = pose_from_homography(Hs, f1, cc0)
    errs = reprojection_errors_normalized(
        qs, ts, points3d[None], bearings_xy[None], mask[None])
    inl = errs < inlier_thresh ** 2
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)
    return qs[best], ts[best], inl[best], counts[best]


def ransac_pnp(points3d: jax.Array, bearings_xy: jax.Array, mask: jax.Array,
               key: jax.Array, num_hypotheses: int = 128, sample_size: int = 6,
               inlier_thresh: float = 0.01):
    """Fixed-size-batch RANSAC PnP (jit-safe).

    Replaces Theia's EstimateCalibratedAbsolutePose + MLE RANSAC
    (pose_estimator.cc:54-90). Samples ``num_hypotheses`` 6-point subsets,
    solves all with one batched SVD, scores all, returns the best pose, its
    inlier mask, and the inlier count.
    """
    P = points3d.shape[-2]
    # Weighted sampling without replacement via Gumbel top-k on valid points.
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (num_hypotheses, P)) + 1e-12) + 1e-12)
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)  # (K, S)
    pts_s = jnp.take(points3d, idx, axis=0)
    brg_s = jnp.take(bearings_xy, idx, axis=0)
    msk_s = jnp.take(mask, idx, axis=0)
    qs, ts = pnp_dlt(pts_s, brg_s, msk_s)
    errs = reprojection_errors_normalized(
        qs, ts, points3d[None], bearings_xy[None], mask[None])  # (K, P)
    inl = errs < inlier_thresh ** 2
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)
    return qs[best], ts[best], inl[best], counts[best]


def radial_division_init(obj_xy: jax.Array, img_centered: jax.Array,
                         mask: jax.Array, lambdas: jax.Array):
    """Distortion-aware uncalibrated init: batched division-model lambda grid.

    TPU-native analog of the reference's radial-distortion uncalibrated
    pose (Larsson radial-P4P minimal solver inside per-view RANSAC,
    /root/reference src/utils/intrinsic_initializer.cc:69-134). Instead of
    a minimal solver + RANSAC per view, every candidate division
    coefficient in ``lambdas`` (units 1/px^2 on principal-point-centered
    pixels, matching the division_undistortion model) is evaluated at
    once: undistort all corners, fit per-view homographies (one batched
    SVD over the (L, V) grid), redistort the homography-predicted points
    with the closed-form division forward map, and score by masked mean
    transfer error in the *distorted* pixel frame (so the score is
    comparable across lambdas). Planar targets make this well-posed with
    far more than minimal correspondences per view.

    obj_xy: (V, P, 2) board-plane coords; img_centered: (V, P, 2) pixel
    coords relative to the assumed principal point; mask: (V, P);
    lambdas: (L,). Returns (best_lambda, Hs_best (V,3,3), err_per_lambda).
    """
    r2 = jnp.sum(img_centered ** 2, -1)  # (V, P)

    def eval_lambda(lam):
        # Guard the division-model denominator: a candidate lam for which
        # 1 + lam r^2 crosses zero inside the observed field is invalid;
        # clamping keeps the SVD finite and the transfer error (computed in
        # the distorted frame below) scores such candidates out naturally.
        den = 1.0 + lam * r2
        und = img_centered / jnp.where(jnp.abs(den) > 1e-3, den, 1e-3)[..., None]
        Hs = homography_dlt(obj_xy, und, mask)
        one = jnp.ones(obj_xy.shape[:-1] + (1,), obj_xy.dtype)
        ph = jnp.einsum("vij,vpj->vpi", Hs, jnp.concatenate([obj_xy, one], -1))
        pu = ph[..., :2] / jnp.where(jnp.abs(ph[..., 2:]) > 1e-9, ph[..., 2:], 1e-9)
        # Closed-form division forward map (redistort): r_d = s * r_u with
        # s = 2 / (1 + sqrt(1 - 4 lam r_u^2)) (see models.cameras.divundist).
        ru2 = jnp.sum(pu ** 2, -1)
        disc = jnp.maximum(1.0 - 4.0 * lam * ru2, 0.0)
        s = 2.0 / (1.0 + jnp.sqrt(disc))
        pd = pu * s[..., None]
        err = jnp.linalg.norm(pd - img_centered, axis=-1)
        n = jnp.maximum(jnp.sum(mask), 1.0)
        mean_err = jnp.sum(err * mask) / n
        return jnp.where(jnp.isfinite(mean_err), mean_err, jnp.inf), Hs

    errs, Hs_all = jax.lax.map(eval_lambda, lambdas)
    best = jnp.argmin(errs)
    return lambdas[best], Hs_all[best], errs
