"""Per-frame camera pose estimation with fixed intrinsics.

TPU-native equivalent of the reference's PoseEstimator
(/root/reference src/core/pose_estimator.cc:92-191
``EstimatePosesFromJson``): undistort corners to the normalized image
plane, calibrated PnP RANSAC per view, per-view pose refinement, reproj /
median-z outlier filtering.

Design differences: every view is processed simultaneously — RANSAC is a
(views x hypotheses) batch, refinement is a vmapped fixed-iteration
damped Gauss-Newton on the 6-dof pose (poses are independent given
intrinsics, so there is no global solve; H is 6x6 per view). One jit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import lie, pnp
from openimucameracalibrator_tpu.utils.types import CameraCalibration, CornerDataset, PoseDataset


@dataclasses.dataclass
class PoseEstimatorOptions:
    min_num_points: int = 8  # pose_estimator.h:72
    num_hypotheses: int = 128
    refine_iters: int = 15
    # Reprojection inlier threshold as a fraction of image height
    # (pose_estimator.cc:94-101 uses 0.4% of height, normalized).
    ransac_thresh_frac: float = 0.004
    max_view_rmse_px: float = 2.0
    median_z_tol: float = 0.5  # relative deviation allowed (FilterBadPoses)


def _refine_pose_gn(q0, t0, pts3d, xy, w, iters: int):
    """Fixed-iteration damped GN on one view's 6-dof pose (vmapped)."""

    def residual(delta, q, t):
        qd = lie.quat_boxplus(q, delta[:3])
        td = t + delta[3:]
        pc = lie.quat_rotate(qd[None], pts3d) + td[None]
        z = jnp.maximum(pc[..., 2], 1e-6)
        r = (pc[..., :2] / z[..., None] - xy) * w[..., None]
        return r.reshape(-1)

    def body(carry, _):
        q, t = carry
        delta0 = jnp.zeros(6, dtype=t.dtype)
        r = residual(delta0, q, t)
        J = jax.jacfwd(residual)(delta0, q, t)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=t.dtype)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g)
        return (lie.quat_boxplus(q, delta[:3]), t + delta[3:]), None

    (q, t), _ = jax.lax.scan(body, (q0, t0), None, length=iters)
    return q, t


@functools.partial(jax.jit, static_argnames=("model_name", "num_hypotheses", "refine_iters"))
def _estimate_all_poses(cam_params, obs, valid, board_pts, key,
                        model_name: str, num_hypotheses: int, refine_iters: int,
                        ransac_thresh: float):
    model = cameras.get_model(model_name)
    # Undistort to normalized image plane (pose_estimator.cc:102-110).
    bearings = model.unproject(cam_params, obs)
    z = jnp.maximum(bearings[..., 2], 1e-6)
    xy = bearings[..., :2] / z[..., None]

    keys = jax.random.split(key, obs.shape[0])

    def per_view(xy_v, valid_v, key_v):
        # Boards are planar: homography-decomposition hypotheses (the 3D
        # DLT is degenerate for coplanar points).
        q, t, inl, cnt = pnp.ransac_pnp_planar(
            board_pts, xy_v, valid_v, key_v,
            num_hypotheses=num_hypotheses, inlier_thresh=ransac_thresh)
        w = (inl & valid_v).astype(xy_v.dtype)
        q, t = _refine_pose_gn(q, t, board_pts, xy_v, w, refine_iters)
        # Final per-view reproj error on inliers (normalized units).
        pc = lie.quat_rotate(q[None], board_pts) + t[None]
        zz = jnp.maximum(pc[..., 2], 1e-6)
        err2 = jnp.sum((pc[..., :2] / zz[..., None] - xy_v) ** 2, -1)
        rmse = jnp.sqrt(jnp.sum(err2 * w) / jnp.maximum(jnp.sum(w), 1.0))
        return q, t, cnt, rmse

    return jax.vmap(per_view)(xy, valid, keys)


def estimate_poses(dataset: CornerDataset, calib: CameraCalibration,
                   options: PoseEstimatorOptions | None = None,
                   seed: int = 0) -> PoseDataset:
    """Estimate camera-to-world poses for every frame. Returns PoseDataset
    (invalid frames flagged, not dropped, to keep shapes static)."""
    opts = options or PoseEstimatorOptions()
    model = cameras.get_model(calib.model_name)
    dt = jnp.float64 if jnp.asarray(calib.params).dtype == jnp.float64 else jnp.float32
    cam_params = jnp.asarray(calib.params, dt)
    obs = jnp.asarray(dataset.points2d, dt)
    valid = jnp.asarray(dataset.valid)
    board_pts = jnp.asarray(dataset.board_points, dt)
    w, h = dataset.image_size
    # Normalized-plane threshold: fraction of image height / focal
    # (pose_estimator.cc:94-101).
    focal = float(np.asarray(calib.params)[model.param_groups["focal"][0]])
    thresh = opts.ransac_thresh_frac * h / focal

    # Fixed-size view chunks: ONE compiled program reused across the
    # video. Compiling the full batch in one graph scales the compiler's
    # working set with the frame count and crashes the TPU compile helper
    # at video scale (observed at 3.6k views); 512-view chunks compile
    # once and pad the tail.
    V = obs.shape[0]
    chunk = min(512, V)
    nch = (V + chunk - 1) // chunk
    pad = nch * chunk - V

    def pz(x, value=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value).reshape(
            (nch, chunk) + x.shape[1:])

    obs_c, valid_c = pz(obs), pz(valid, False)
    keys = jax.random.split(jax.random.PRNGKey(seed), nch)
    outs = [_estimate_all_poses(cam_params, obs_c[c], valid_c[c], board_pts,
                                keys[c], model.name, opts.num_hypotheses,
                                opts.refine_iters, thresh)
            for c in range(nch)]
    q_cw, t_cw, counts, rmse = (jnp.concatenate(a)[:V]
                                for a in zip(*outs))

    counts = np.asarray(counts)
    rmse_px = np.asarray(rmse) * focal
    ok = (counts >= opts.min_num_points) & (rmse_px < opts.max_view_rmse_px)

    # Median-z filter on camera height above the board plane
    # (pose_estimator.cc:238-261): reject poses whose distance to the board
    # deviates grossly from the median.
    q_wc, t_wc = lie.se3_inverse(jnp.asarray(q_cw), jnp.asarray(t_cw))
    t_wc = np.asarray(t_wc)
    if ok.any():
        med = np.median(t_wc[ok, 2])
        dev = np.abs(t_wc[:, 2] - med)
        ok &= dev < np.maximum(opts.median_z_tol * abs(med), 0.3)

    return PoseDataset(
        times=np.asarray(dataset.times), q_w_c=np.asarray(q_wc),
        t_w_c=t_wc, valid=ok, board_points=np.asarray(dataset.board_points))


# ---------------------------------------------------------------------------
# Board-point refinement with empirical covariance
# (reference OptimizeBoardPoints, src/core/pose_estimator.cc:193-224)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model_name", "iters"))
def _optimize_points_jit(cam_params, obs, valid, board_pts, q_cw, t_cw,
                         pose_valid, model_name: str, iters: int = 10):
    """Refine each board point independently with all poses fixed.

    Points are conditionally independent given poses, so this is a vmapped
    batch of (3,3) GN solves — the Schur-eliminated point update of a full
    BA with frozen camera blocks. Returns (points (P,3), cov (P,3,3),
    reproj_cov (P,2,2)): parameter covariance from sigma^2 (J^T J)^-1 and
    the empirical image-space residual covariance per point (used to whiten
    spline-stage reprojection residuals; ceres_calib_split_residuals.h:
    276-277 contract).
    """
    model = cameras.get_model(model_name)
    w_all = (valid & pose_valid[:, None]).astype(obs.dtype)  # (V, P)

    def point_residual(pt, uv_v, w_v):
        pc = jax.vmap(lambda q, t: lie.quat_rotate(q, pt) + t)(q_cw, t_cw)
        uv_pred, ok = model.project(cam_params, pc)
        r = (uv_pred - uv_v) * (w_v * ok)[:, None]
        return r.reshape(-1)

    def refine_one(pt0, uv_v, w_v):
        def body(pt, _):
            r = point_residual(pt, uv_v, w_v)
            J = jax.jacfwd(point_residual)(pt, uv_v, w_v)
            H = J.T @ J + 1e-6 * jnp.eye(3, dtype=pt.dtype)
            step = -jnp.linalg.solve(H, J.T @ r)
            # Keep points near the board plane (reference uses homogeneous
            # parametrization + pose prior; a soft z clamp is equivalent
            # regularization for planar targets).
            return pt + step, None

        pt, _ = jax.lax.scan(body, pt0, None, length=iters)
        r = point_residual(pt, uv_v, w_v)
        J = jax.jacfwd(point_residual)(pt, uv_v, w_v)
        H = J.T @ J
        n_obs = jnp.maximum(jnp.sum(w_v), 1.0)
        dof = jnp.maximum(2.0 * n_obs - 3.0, 1.0)
        sigma2 = jnp.sum(r * r) / dof
        cov = sigma2 * jnp.linalg.inv(H + 1e-9 * jnp.eye(3, dtype=pt.dtype))
        # Empirical 2x2 image-residual covariance of this corner.
        r2 = r.reshape(-1, 2)
        rc = (r2.T @ r2) / n_obs
        return pt, cov, rc

    return jax.vmap(refine_one, in_axes=(0, 1, 1))(board_pts, obs, w_all)


def optimize_board_points(dataset: CornerDataset, calib: CameraCalibration,
                          poses: PoseDataset, iters: int = 10,
                          min_obs: int = 30):
    """Refine board 3D points against all estimated poses and report their
    empirical covariance (OptimizeBoardPoints, pose_estimator.cc:193-224;
    ``min_num_obs_for_optim_=30`` pose_estimator.h:78).

    Returns (PoseDataset with refined board_points, info dict with
    point_cov (P,3,3), reproj_cov (P,2,2), std_mm per point).
    """
    dt = jnp.float64 if jnp.asarray(calib.params).dtype == jnp.float64 else jnp.float32
    obs_count = (dataset.valid & poses.valid[:, None]).sum(axis=0)  # (P,)
    q_cw, t_cw = lie.se3_inverse(jnp.asarray(poses.q_w_c, dt),
                                 jnp.asarray(poses.t_w_c, dt))
    pts, cov, rcov = _optimize_points_jit(
        jnp.asarray(calib.params, dt), jnp.asarray(dataset.points2d, dt),
        jnp.asarray(dataset.valid), jnp.asarray(poses.board_points, dt),
        q_cw, t_cw, jnp.asarray(poses.valid), calib.model_name, iters)
    pts = np.asarray(pts)
    cov = np.asarray(cov)
    rcov = np.asarray(rcov)
    # Only trust refinement where the corner was observed enough.
    keep = np.asarray(obs_count) >= min_obs
    new_pts = np.where(keep[:, None], pts, np.asarray(poses.board_points))
    std_mm = np.sqrt(np.maximum(np.trace(cov, axis1=1, axis2=2), 0.0) / 3.0) * 1e3
    info = {"point_cov": cov, "reproj_cov": rcov, "std_mm": std_mm,
            "refined": keep}
    return dataclasses.replace(poses, board_points=new_pts), info
