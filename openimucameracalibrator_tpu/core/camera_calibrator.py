"""Camera intrinsic calibration from board corner observations.

TPU-native equivalent of the reference's CameraCalibrator
(/root/reference src/core/camera_calibrator.cc:221-388
``CalibrateCameraFromJson`` + :131-219 ``RunCalibration``):

1. Initialization — instead of per-view Theia RANSAC P4P-focal
   (camera_calibrator.cc:268-307), all views are initialized at once with
   batched normalized-DLT homographies + Zhang's closed-form shared-focal
   estimate + homography pose decomposition (ops/pnp.py). Planar targets
   make this exact and it is one SVD batch on the accelerator.
2. Voxel-grid view deduplication (camera_calibrator.cc:314-327): greedy
   min-distance thinning of camera positions.
3. Three-stage bundle adjustment with Huber loss (1.345 px) and view
   pruning (camera_calibrator.cc:131-219):
   stage 1: focal + distortion + poses free, prune views > 5 px;
   stage 2: principal point only;
   stage 3: everything free, prune views > 2 px.
   Each stage is ONE jit-compiled LM solve; stages differ only in the
   tangent-space free mask and per-view weights (no recompilation).

The BA parameterization: camera params (model vector), per-view
camera-from-world poses as (quat, translation) blocks with quaternion
retraction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import lie, pnp
from openimucameracalibrator_tpu.solver import blocks, lm, robust
from openimucameracalibrator_tpu.utils.types import CameraCalibration, CornerDataset
from openimucameracalibrator_tpu.utils import precision

HUBER_PX = 1.345  # camera_calibrator.cc:140-144


@dataclasses.dataclass
class CameraCalibratorOptions:
    grid_size: float = 0.04  # voxel dedup spacing, meters (camera_calibrator.h:60)
    min_num_views: int = 10  # camera_calibrator.h:85
    max_views: int = 120  # static-shape cap on deduped views
    stage1_prune_px: float = 5.0  # camera_calibrator.cc:162
    stage3_prune_px: float = 2.0  # camera_calibrator.cc:201
    max_iters: int = 40
    # Optional stage 4: refine board points against an imperfect target
    # (camera_calibrator.cc:208-216 "optimize_board_points").
    optimize_board_points: bool = False
    dtype: type = None


def _build_layout(num_views: int, num_cam_params: int, num_points: int):
    return blocks.BlockLayout([
        blocks.BlockSpec("cam", (num_cam_params,)),
        blocks.BlockSpec("q_cw", (num_views, 4), "quat"),
        blocks.BlockSpec("t_cw", (num_views, 3)),
        blocks.BlockSpec("pts", (num_points, 3)),
    ])


def _make_residual_fn(model: cameras.CameraModel, obs, valid, px_scale=1.0):
    """Whitened reprojection residuals, flattened over (view, point, xy)."""

    def residual(params, view_w):
        p_cam = lie.quat_rotate(params["q_cw"][:, None, :], params["pts"][None]) + params["t_cw"][:, None, :]
        uv, ok = model.project(params["cam"], p_cam)
        w = (valid & ok).astype(uv.dtype) * view_w[:, None]
        r = (uv - obs) * w[..., None] * px_scale
        return r.reshape(-1)

    return residual


@functools.partial(jax.jit, static_argnames=("model_name", "max_iters"))
def _run_ba_stage(params0, free_mask, view_w, obs, valid,
                  model_name: str, max_iters: int):
    model = cameras.get_model(model_name)
    layout = _build_layout(obs.shape[0], model.num_params, params0["pts"].shape[0])
    residual = _make_residual_fn(model, obs, valid)
    wfn = lambda r: robust.huber_sqrt_weights(r, HUBER_PX, group_size=2)
    lin, cost, retract = lm.make_dense_linearizer(
        lambda p: residual(p, view_w), layout, weight_fn=wfn)
    res = lm.lm_optimize(lin, cost, retract, params0, free_mask,
                         lm.LMConfig(max_iters=max_iters, ftol=1e-8))
    return res.params, res.cost, res.iterations


@functools.partial(jax.jit, static_argnames=("model_name",))
def _per_view_rmse(params, obs, valid, model_name: str):
    model = cameras.get_model(model_name)
    p_cam = lie.quat_rotate(params["q_cw"][:, None, :], params["pts"][None]) + params["t_cw"][:, None, :]
    uv, ok = model.project(params["cam"], p_cam)
    good = valid & ok
    err2 = jnp.sum((uv - obs) ** 2, -1) * good
    n = jnp.maximum(jnp.sum(good, -1), 1)
    return jnp.sqrt(jnp.sum(err2, -1) / n), good


@functools.partial(jax.jit, static_argnames=("model_name",))
def mean_reproj_error(params, obs, valid, model_name: str, view_w):
    """Mean per-observation pixel error over active views (the metric the
    reference reports, camera_calibrator.cc:364-368)."""
    model = cameras.get_model(model_name)
    p_cam = lie.quat_rotate(params["q_cw"][:, None, :], params["pts"][None]) + params["t_cw"][:, None, :]
    uv, ok = model.project(params["cam"], p_cam)
    good = valid & ok & (view_w[:, None] > 0)
    err = jnp.linalg.norm(uv - obs, axis=-1) * good
    return jnp.sum(err) / jnp.maximum(jnp.sum(good), 1)


def initialize_views(dataset: CornerDataset, dtype=None,
                     distortion_aware: bool = False):
    """Batched homography init: shared focal + per-view camera-from-world pose.

    With ``distortion_aware`` (the analog of the reference's Larsson
    radial-P4P init for distortion models, intrinsic_initializer.cc:69-134),
    a division-model coefficient grid is searched first (ops/pnp.py
    ``radial_division_init``) and the homographies/focal come from the
    undistorted corners — robust on strongly-distorted (fisheye) footage
    where plain DLT on distorted pixels biases the focal.

    Returns (f0, q_cw, t_cw, enough, lam) — lam is the best division
    coefficient (1/px^2, principal-point-centered), 0.0 when not searched.
    """
    dtype = precision.resolve(dtype)
    w, h = dataset.image_size
    cc = jnp.array([w / 2.0, h / 2.0], dtype=dtype)
    obs = jnp.asarray(dataset.points2d, dtype)
    valid = jnp.asarray(dataset.valid)
    board_xy = jnp.asarray(dataset.board_points[:, :2], dtype)
    obj = jnp.broadcast_to(board_xy, (obs.shape[0],) + board_xy.shape)
    mask = valid.astype(dtype)
    lam = 0.0
    if distortion_aware:
        # Grid in normalized units lam_n = lam * diag^2 — the physically
        # plausible range for division-model lenses (GoPro-class wide FOV
        # sits near -1: reference d = -1.44e-6 at diag^2 = 1.2e6 px^2).
        diag2 = float(w * w + h * h)
        lam_grid = jnp.asarray(np.linspace(-2.0, 0.5, 26) / diag2, dtype)
        lam_b, Hs, _ = pnp.radial_division_init(obj, obs - cc, mask, lam_grid)
        lam = float(lam_b)
        r2 = jnp.sum((obs - cc) ** 2, -1)
        obs_init = cc + (obs - cc) / (1.0 + lam_b * r2)[..., None]
        Hs = pnp.homography_dlt(obj, obs_init - cc, mask)
    else:
        Hs = pnp.homography_dlt(obj, obs - cc, mask)
    enough = jnp.sum(valid, -1) >= 10
    f0 = pnp.zhang_focal(Hs, enough)
    q_cw, t_cw = pnp.pose_from_homography(Hs, jnp.full((obs.shape[0],), f0, dtype),
                                          jnp.zeros((obs.shape[0], 2), dtype))
    return float(f0), np.asarray(q_cw), np.asarray(t_cw), np.asarray(enough), lam


def _voxel_dedup(t_wc: np.ndarray, usable: np.ndarray, grid_size: float, max_views: int):
    """Greedy spatial thinning of view positions (camera_calibrator.cc:314-327)."""
    picked = []
    for v in range(t_wc.shape[0]):
        if not usable[v]:
            continue
        if picked and np.min(np.linalg.norm(t_wc[picked] - t_wc[v], axis=-1)) < grid_size:
            continue
        picked.append(v)
        if len(picked) >= max_views:
            break
    return np.asarray(picked, dtype=np.int64)


def calibrate_camera(dataset: CornerDataset, model_name: str,
                     options: CameraCalibratorOptions | None = None):
    """Full intrinsic calibration. Returns (CameraCalibration, details dict)."""
    opts = options or CameraCalibratorOptions()
    model = cameras.get_model(model_name)
    dt = precision.resolve(opts.dtype)
    w, h = dataset.image_size

    f0, q_cw, t_cw, enough, lam0 = initialize_views(
        dataset, dt, distortion_aware=(model.name != "pinhole"))
    # Camera position in world = -R^T t.
    cam_pos = np.einsum("vij,vj->vi",
                        np.transpose(np.asarray(lie.quat_to_matrix(jnp.asarray(q_cw))), (0, 2, 1)),
                        -t_cw)
    picked = _voxel_dedup(cam_pos, enough, opts.grid_size, opts.max_views)
    # Adaptive dedup: on short recordings a fixed voxel size can thin the
    # usable views below min_num_views even though detection was healthy
    # (the reference hard-fails there, camera_calibrator.h:85). Halve the
    # spacing until enough views survive — spatial diversity is a
    # conditioning heuristic, not a correctness requirement.
    grid = opts.grid_size
    while picked.size < opts.min_num_views and grid > 1e-6 and \
            picked.size < int(np.sum(enough)):
        grid *= 0.5
        picked = _voxel_dedup(cam_pos, enough, grid, opts.max_views)
    if grid != opts.grid_size and picked.size >= opts.min_num_views:
        print(f"   [camera_calibrator] voxel grid relaxed "
              f"{opts.grid_size:.4f} -> {grid:.4f} m to keep "
              f"{picked.size} views")
    if picked.size < opts.min_num_views:
        # Per-view diagnosis instead of a bare count: say WHY views were
        # dropped (detection/init attrition vs dedup) so a near-miss is
        # actionable (reference logs and continues, camera_calibrator.cc:236-340).
        n_corners = np.sum(np.asarray(dataset.valid), -1)
        n_total = len(n_corners)
        n_enough = int(np.sum(enough))
        raise ValueError(
            f"only {picked.size} usable views (need >= {opts.min_num_views}): "
            f"{n_total} frames, {n_enough} with >=10 detected corners "
            f"(per-frame corner counts {n_corners.tolist()}), "
            f"{n_enough - picked.size} removed by voxel dedup at final "
            f"grid {grid:.5f} m (start {opts.grid_size} m). Record more "
            f"viewpoint diversity or lower min_num_views.")

    obs = jnp.asarray(dataset.points2d[picked], dt)
    valid = jnp.asarray(dataset.valid[picked])
    board_pts = jnp.asarray(dataset.board_points, dt)

    cam0 = model.init_params(f0, w / 2.0, h / 2.0, dtype=dt)
    if model.name == "division_undistortion":
        cam0 = cam0.at[3].set(lam0)  # seed d from the radial grid search
    params = {
        "cam": cam0,
        "q_cw": jnp.asarray(q_cw[picked], dt),
        "t_cw": jnp.asarray(t_cw[picked], dt),
        "pts": board_pts,
    }
    layout = _build_layout(picked.size, model.num_params, board_pts.shape[0])
    groups = model.param_groups
    view_w = jnp.ones((picked.size,), dt)

    def cam_mask(free_idx):
        m = np.zeros(model.num_params)
        m[free_idx] = 1.0
        return m

    # Stage 1: focal + distortion + poses (camera_calibrator.cc:146-162).
    # Double-sphere multi-start: the (f, xi) pair has near-equivalent
    # solution families over a finite FOV (the reference carries a special
    # DS initializer for the same reason, intrinsic_initializer.cc:138-296).
    # Seed xi in {-0.25, 0, +0.25} with the focal rescaled to keep the
    # near-axis magnification f/(1+xi) fixed, and keep the lowest-cost
    # stage-1 solution — all starts reuse the one compiled stage.
    mask1 = layout.free_mask(fixed=["pts"],
                             partial_masks={"cam": cam_mask(groups["focal"] + groups["dist"])})
    starts = [params]
    if model.name == "double_sphere":
        for xi0 in (-0.25, 0.25):
            cam_alt = cam0.at[4].set(xi0)
            cam_alt = cam_alt.at[0].set(cam0[0] * (1 + xi0))
            cam_alt = cam_alt.at[1].set(cam0[1] * (1 + xi0))
            starts.append(dict(params, cam=cam_alt))
    best = None
    for cand in starts:
        out = _run_ba_stage(cand, mask1, view_w, obs, valid,
                            model.name, opts.max_iters)
        # Finiteness guard: a NaN stage-1 cost (degenerate start, all LM
        # steps rejected) must never beat a finite alternative start.
        if (best is None or not np.isfinite(float(best[1]))
                or float(out[1]) < float(best[1])):
            best = out
    params, cost, it1 = best
    rmse, _ = _per_view_rmse(params, obs, valid, model.name)
    view_w = view_w * (rmse < opts.stage1_prune_px)

    # Stage 2: principal point only (camera_calibrator.cc:164-174).
    mask2 = layout.free_mask(fixed=["q_cw", "t_cw", "pts"],
                             partial_masks={"cam": cam_mask(groups["pp"])})
    params, cost, it2 = _run_ba_stage(params, mask2, view_w, obs, valid,
                                      model.name, opts.max_iters)

    # Stage 3: all intrinsics + poses, prune > 2 px (camera_calibrator.cc:181-201).
    mask3 = layout.free_mask(fixed=["pts"])
    params, cost, it3 = _run_ba_stage(params, mask3, view_w, obs, valid,
                                      model.name, opts.max_iters)
    rmse, _ = _per_view_rmse(params, obs, valid, model.name)
    view_w = view_w * (rmse < opts.stage3_prune_px)
    params, cost, it4 = _run_ba_stage(params, mask3, view_w, obs, valid,
                                      model.name, opts.max_iters)

    if opts.optimize_board_points:
        # Stage 4: free the board points too; anchor the gauge by keeping
        # the first two corners fixed (translation + scale/rotation pin,
        # replacing the reference's homogeneous parameterization).
        pts_mask = np.ones((board_pts.shape[0], 3))
        pts_mask[:2] = 0.0
        mask4 = layout.free_mask(partial_masks={"pts": pts_mask})
        params, cost, it5 = _run_ba_stage(params, mask4, view_w, obs, valid,
                                          model.name, opts.max_iters)

    rmse, good = _per_view_rmse(params, obs, valid, model.name)
    active = np.asarray(view_w) > 0
    err = float(mean_reproj_error(params, obs, valid, model.name, view_w))

    calib = CameraCalibration(
        model_name=model.name, params=np.asarray(params["cam"]),
        image_size=dataset.image_size, mean_reproj_error=err, fps=dataset.fps)
    details = {
        "picked_views": picked, "active": active,
        "q_cw": np.asarray(params["q_cw"]), "t_cw": np.asarray(params["t_cw"]),
        "per_view_rmse": np.asarray(rmse), "iters": [int(it1), int(it2), int(it3), int(it4)],
        "init_focal": f0, "board_points": np.asarray(params["pts"]),
    }
    return calib, details


# ---------------------------------------------------------------------------
# Multi-model batched calibration (BASELINE configs[1])
#
# N (model, dataset) pairs run through ONE compiled 3-stage BA: camera
# parameter vectors are padded to a common width, the projection is a
# lax.switch over the distinct models present, and every LM stage is
# vmapped over the lane axis — per-lane free masks carry both the model's
# parameter-group structure and the padding. Model lanes that need
# multi-start (double sphere) simply become extra lanes, reduced after
# stage 1. The reference has no such mode (one CameraCalibrator per run).
# ---------------------------------------------------------------------------

def _switch_project(model_names: tuple):
    models = [cameras.get_model(n) for n in model_names]

    def project(mid, cam_padded, p_cam):
        return jax.lax.switch(
            mid, [lambda c, x, m=m: m.project(c[:m.num_params], x)
                  for m in models], cam_padded, p_cam)

    return project


@functools.partial(jax.jit, static_argnames=("model_names", "max_iters"))
def _run_ba_stage_multi(params_b, mask_b, view_w_b, obs_b, valid_b, mid_b,
                        model_names: tuple, max_iters: int):
    npad = params_b["cam"].shape[-1]
    layout = _build_layout(obs_b.shape[1], npad, params_b["pts"].shape[1])
    project = _switch_project(model_names)

    def one(params, mask, view_w, obs, valid, mid):
        def residual(prm):
            p_cam = lie.quat_rotate(prm["q_cw"][:, None, :], prm["pts"][None]) \
                + prm["t_cw"][:, None, :]
            uv, ok = project(mid, prm["cam"], p_cam)
            w = (valid & ok).astype(uv.dtype) * view_w[:, None]
            return ((uv - obs) * w[..., None]).reshape(-1)

        wfn = lambda r: robust.huber_sqrt_weights(r, HUBER_PX, group_size=2)
        lin, cost, retract = lm.make_dense_linearizer(residual, layout,
                                                      weight_fn=wfn)
        res = lm.lm_optimize(lin, cost, retract, params, mask,
                             lm.LMConfig(max_iters=max_iters, ftol=1e-8))
        return res.params, res.cost, res.iterations

    return jax.vmap(one)(params_b, mask_b, view_w_b, obs_b, valid_b, mid_b)


@functools.partial(jax.jit, static_argnames=("model_names",))
def _per_view_rmse_multi(params_b, obs_b, valid_b, mid_b, model_names: tuple):
    project = _switch_project(model_names)

    def one(params, obs, valid, mid):
        p_cam = lie.quat_rotate(params["q_cw"][:, None, :],
                                params["pts"][None]) + params["t_cw"][:, None, :]
        uv, ok = project(mid, params["cam"], p_cam)
        good = valid & ok
        err2 = jnp.sum((uv - obs) ** 2, -1) * good
        n = jnp.maximum(jnp.sum(good, -1), 1)
        err = jnp.linalg.norm(uv - obs, axis=-1) * good
        return jnp.sqrt(jnp.sum(err2, -1) / n), err, good

    return jax.vmap(one)(params_b, obs_b, valid_b, mid_b)


def calibrate_camera_batch(jobs, options: CameraCalibratorOptions | None = None):
    """Calibrate N (model_name, CornerDataset) pairs in one compiled solve.

    Returns a list of (CameraCalibration, details) in input order. All
    datasets must share the image size class (shapes are padded to common
    maxima). Host-side init (homography/focal, voxel dedup) runs per
    dataset; the 3-stage BA schedule runs vmapped over lanes.
    """
    opts = options or CameraCalibratorOptions()
    dt = precision.resolve(opts.dtype)

    # --- host-side per-dataset init (same path as calibrate_camera) ---
    lanes = []  # (job_idx, model, params, obs, valid, is_alt_start)
    for ji, (model_name, dataset) in enumerate(jobs):
        model = cameras.get_model(model_name)
        w, h = dataset.image_size
        f0, q_cw, t_cw, enough, lam0 = initialize_views(
            dataset, dt, distortion_aware=(model.name != "pinhole"))
        cam_pos = np.einsum(
            "vij,vj->vi",
            np.transpose(np.asarray(lie.quat_to_matrix(jnp.asarray(q_cw))),
                         (0, 2, 1)), -t_cw)
        picked = _voxel_dedup(cam_pos, enough, opts.grid_size, opts.max_views)
        grid = opts.grid_size
        while picked.size < opts.min_num_views and grid > 1e-6 and \
                picked.size < int(np.sum(enough)):
            grid *= 0.5
            picked = _voxel_dedup(cam_pos, enough, grid, opts.max_views)
        if picked.size < opts.min_num_views:
            raise ValueError(f"job {ji} ({model_name}): only {picked.size} "
                             f"usable views (need >= {opts.min_num_views})")
        cam0 = model.init_params(f0, w / 2.0, h / 2.0, dtype=dt)
        if model.name == "division_undistortion":
            cam0 = cam0.at[3].set(lam0)
        base = dict(job=ji, model=model, picked=picked, f0=f0,
                    obs=np.asarray(dataset.points2d[picked], np.float64),
                    valid=np.asarray(dataset.valid[picked]),
                    pts=np.asarray(dataset.board_points, np.float64),
                    q_cw=q_cw[picked], t_cw=t_cw[picked])
        lanes.append(dict(base, cam=np.asarray(cam0), alt=False))
        if model.name == "double_sphere":
            for xi0 in (-0.25, 0.25):
                cam_alt = np.asarray(cam0)
                cam_alt = cam_alt.copy()
                cam_alt[4] = xi0
                cam_alt[0] = float(cam0[0]) * (1 + xi0)
                cam_alt[1] = float(cam0[1]) * (1 + xi0)
                lanes.append(dict(base, cam=cam_alt, alt=True))

    model_names = tuple(dict.fromkeys(ln["model"].name for ln in lanes))
    npad = max(cameras.get_model(n).num_params for n in model_names)
    v_max = max(ln["obs"].shape[0] for ln in lanes)
    p_max = max(ln["pts"].shape[0] for ln in lanes)
    L = len(lanes)

    def padv(x, n, axis=0, value=0.0):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, n - x.shape[axis])
        return np.pad(x, pad, constant_values=value)

    obs_b = np.zeros((L, v_max, p_max, 2))
    valid_b = np.zeros((L, v_max, p_max), bool)
    params_b = {"cam": np.zeros((L, npad)),
                "q_cw": np.zeros((L, v_max, 4)),
                "t_cw": np.zeros((L, v_max, 3)),
                "pts": np.zeros((L, p_max, 3))}
    params_b["q_cw"][..., 0] = 1.0  # padded views: identity quats
    view_w_b = np.zeros((L, v_max))
    mid_b = np.zeros((L,), np.int32)
    layout = _build_layout(v_max, npad, p_max)
    D = layout.tangent_dim
    mask1_b = np.zeros((L, D))
    mask2_b = np.zeros((L, D))
    mask3_b = np.zeros((L, D))
    for i, ln in enumerate(lanes):
        m = ln["model"]
        V, P = ln["obs"].shape[:2]
        obs_b[i, :V, :P] = ln["obs"]
        valid_b[i, :V, :P] = ln["valid"]
        params_b["cam"][i, :m.num_params] = ln["cam"]
        params_b["q_cw"][i, :V] = ln["q_cw"]
        params_b["t_cw"][i, :V] = ln["t_cw"]
        params_b["pts"][i, :P] = ln["pts"]
        view_w_b[i, :V] = 1.0
        mid_b[i] = model_names.index(m.name)

        def cam_mask(free_idx):
            c = np.zeros(npad)
            c[np.asarray(free_idx, int)] = 1.0
            return c

        pose_mask = np.zeros((v_max, 3))
        pose_mask[:V] = 1.0
        g = m.param_groups
        mask1_b[i] = np.asarray(layout.free_mask(
            fixed=["pts"],
            partial_masks={"cam": cam_mask(g["focal"] + g["dist"]),
                           "q_cw": pose_mask, "t_cw": pose_mask}))
        mask2_b[i] = np.asarray(layout.free_mask(
            fixed=["q_cw", "t_cw", "pts"],
            partial_masks={"cam": cam_mask(g["pp"])}))
        cam_all = np.zeros(npad)
        cam_all[:m.num_params] = 1.0
        mask3_b[i] = np.asarray(layout.free_mask(
            fixed=["pts"], partial_masks={"cam": cam_all,
                                          "q_cw": pose_mask,
                                          "t_cw": pose_mask}))

    jb = {k: jnp.asarray(v, dt) for k, v in params_b.items()}
    obs_j = jnp.asarray(obs_b, dt)
    valid_j = jnp.asarray(valid_b)
    vw = jnp.asarray(view_w_b, dt)
    mid_j = jnp.asarray(mid_b)
    m1, m2, m3 = (jnp.asarray(m) for m in (mask1_b, mask2_b, mask3_b))

    # Stage 1 (+ multi-start reduction).
    prm, cost, _ = _run_ba_stage_multi(jb, m1, vw, obs_j, valid_j, mid_j,
                                       model_names, opts.max_iters)
    costs = np.asarray(cost)
    keep = []
    for ji in range(len(jobs)):
        idxs = [i for i, ln in enumerate(lanes) if ln["job"] == ji]
        finite = [i for i in idxs if np.isfinite(costs[i])]
        keep.append(min(finite or idxs, key=lambda i: costs[i]))
    sel = jnp.asarray(keep)
    take = lambda t: jax.tree_util.tree_map(lambda x: x[sel], t)
    prm, vw, obs_j, valid_j, mid_j = (take(prm), vw[sel], obs_j[sel],
                                      valid_j[sel], mid_j[sel])
    m1, m2, m3 = m1[sel], m2[sel], m3[sel]

    rmse, _, _ = _per_view_rmse_multi(prm, obs_j, valid_j, mid_j, model_names)
    vw = vw * (rmse < opts.stage1_prune_px)
    prm, cost, _ = _run_ba_stage_multi(prm, m2, vw, obs_j, valid_j, mid_j,
                                       model_names, opts.max_iters)
    prm, cost, _ = _run_ba_stage_multi(prm, m3, vw, obs_j, valid_j, mid_j,
                                       model_names, opts.max_iters)
    rmse, _, _ = _per_view_rmse_multi(prm, obs_j, valid_j, mid_j, model_names)
    vw = vw * (rmse < opts.stage3_prune_px)
    prm, cost, _ = _run_ba_stage_multi(prm, m3, vw, obs_j, valid_j, mid_j,
                                       model_names, opts.max_iters)

    rmse, err, good = _per_view_rmse_multi(prm, obs_j, valid_j, mid_j,
                                           model_names)
    out = []
    err_np, good_np = np.asarray(err), np.asarray(good)
    vw_np = np.asarray(vw)
    for ji, (model_name, dataset) in enumerate(jobs):
        m = cameras.get_model(model_name)
        ln = lanes[keep[ji]]
        V = ln["obs"].shape[0]
        act = (vw_np[ji, :, None] > 0) & good_np[ji]
        tot = err_np[ji][act].sum()
        n = max(int(act.sum()), 1)
        calib = CameraCalibration(
            model_name=m.name,
            params=np.asarray(prm["cam"][ji][:m.num_params]),
            image_size=dataset.image_size, mean_reproj_error=float(tot / n),
            fps=dataset.fps)
        details = {"picked_views": ln["picked"],
                   "active": vw_np[ji, :V] > 0,
                   "q_cw": np.asarray(prm["q_cw"][ji][:V]),
                   "t_cw": np.asarray(prm["t_cw"][ji][:V]),
                   "per_view_rmse": np.asarray(rmse[ji][:V]),
                   "init_focal": ln["f0"]}
        out.append((calib, details))
    return out
