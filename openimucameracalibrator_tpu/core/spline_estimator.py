"""Continuous-time B-spline IMU+camera batch calibration.

TPU-native replacement for the reference's SplineTrajectoryEstimator<N=6>
(/root/reference include/OpenCameraCalibrator/core/
spline_trajectory_estimator.h + .impl.h) and its Ceres cost functors
(basalt_spline/ceres_calib_split_residuals.h). The trajectory is a split
cumulative SO(3) x R^3 uniform B-spline (order 6) with order-3 bias
splines, gravity, T_imu_cam, and rolling-shutter line delay as parameters.

Architecture (vs. the reference's Ceres problem):

* Measurements live in three statically-shaped batches (accelerometer,
  gyroscope, per-observation reprojection). Each measurement touches a
  static window of knots (6 SO3 + 6 R3 + 3 bias), so its Jacobian w.r.t.
  a LOCAL tangent vector (<=48 dims) is a small dense block computed by
  ``vmap(jacfwd)`` — the TPU analog of Ceres' autodiff cost functors
  (ceres_calib_split_residuals.h:23-410).
* Normal equations are assembled by scatter-adding the J^T J blocks into a
  dense (D, D) matrix (D = total tangent dim, a few thousand), chunked to
  bound memory. The band structure (block-banded H) is what makes this
  exact and cheap — the dense Cholesky solve replaces Ceres
  SPARSE_NORMAL_CHOLESKY (impl.h:254-276).
* Parameter fixing (the reference's SplineOptimFlags bitmask,
  spline_trajectory_estimator.h:17-27 / SetFixedParams impl.h:92-252) is a
  0/1 mask over the tangent vector; one compiled solver serves every flag
  combination.
* Rolling shutter: each observation's capture time is t_frame +
  line_delay * row (impl.h:344-346). The knot-window index uses
  stop_gradient(t) so shapes/gathers stay fixed while the in-segment
  coordinate u keeps the line-delay gradient.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import interpolation, lie, spline
from openimucameracalibrator_tpu.solver import blocks, lm, robust
from openimucameracalibrator_tpu.utils import precision
from openimucameracalibrator_tpu.utils.types import (CameraCalibration, CornerDataset,
                                                     ImuData, PoseDataset,
                                                     SplineWeightingData)

ORDER = 6  # imu_camera_calibrator.h:27 (SPLINE_N)
BIAS_ORDER = 3  # ceres_calib_split_residuals.h:21 (BIAS_SPLINE_N)
HUBER_PX = 1.345


# Optimization flag names (SplineOptimFlags equivalent).
SPLINE = "spline"
T_I_C = "t_i_c"
IMU_BIASES = "imu_biases"
GRAVITY_DIR = "gravity"
CAM_LINE_DELAY = "line_delay"
IMU_INTRINSICS = "imu_intrinsics"
ACC_BIAS = "acc_bias"  # granular bias flags (SplineOptimFlags ACC_BIAS/GYR_BIAS)
GYR_BIAS = "gyr_bias"
# Extension over the reference: the vision-vs-IMU time offset can be refined
# inside the batch problem (the reference freezes it after the golden-section
# init, which carries an O(line_delay * image_height / 2) rolling-shutter
# bias plus pose-noise error).
TIME_OFFSET = "time_offset"
POINTS = "points"  # SplineOptimFlags::POINTS (spline_trajectory_estimator.h:17)
DEFAULT_FLAGS = frozenset({SPLINE, T_I_C, IMU_BIASES, GRAVITY_DIR})


class SplineProblem(NamedTuple):
    """Static measurement batches + spline metadata (all times IMU clock)."""

    # spline meta (python floats/ints -> static under jit)
    t0: float
    dt_so3: float
    dt_r3: float
    dt_bias: float
    n_so3: int
    n_r3: int
    n_bias: int
    # accelerometer
    accel_t: jnp.ndarray  # (Ma,)
    accel_meas: jnp.ndarray  # (Ma, 3)
    accel_valid: jnp.ndarray  # (Ma,)
    w_accel: float  # 1/std_r3 (imu_camera_calibrator.cc:108-119)
    # gyroscope
    gyro_t: jnp.ndarray
    gyro_meas: jnp.ndarray
    gyro_valid: jnp.ndarray
    w_gyro: float
    # reprojection (per observation)
    obs_t: jnp.ndarray  # (Mo,) frame time
    obs_row: jnp.ndarray  # (Mo,) pixel row (for RS)
    obs_uv: jnp.ndarray  # (Mo, 2)
    obs_pt: jnp.ndarray  # (Mo, 3) board point
    obs_valid: jnp.ndarray  # (Mo,)
    cam_params: jnp.ndarray
    model_name: str
    rolling_shutter: bool
    # --- board points as parameters + feature covariance (optional) ---
    # n_points > 0 adds a "points" block to the layout (the reference's
    # POINTS flag, spline_trajectory_estimator.h:17-27); observations then
    # read their board point from the parameter dict via obs_pt_id.
    n_points: int = 0
    obs_pt_id: jnp.ndarray | None = None  # (Mo,) int32 index into points
    # Per-observation residual whitening S (2, 2) with S^T S = cov^-1
    # (feature-covariance whitening, ceres_calib_split_residuals.h:276-277,
    # 395-396). None = identity.
    obs_sqrt_info: jnp.ndarray | None = None  # (Mo, 2, 2)
    # Gaussian prior pinning the points block (pt ~ N(prior_mean, cov)):
    # kills the translation/rotation gauge freed by POINTS and encodes the
    # empirical covariance of OptimizeBoardPoints (pose_estimator.cc:193-224).
    pt_prior_mean: jnp.ndarray | None = None  # (P, 3)
    pt_prior_sqrt_info: jnp.ndarray | None = None  # (P, 3, 3)
    # Upper bound of the valid measurement-time range. None (default):
    # derived from the knot counts. The multi-sequence batch pads knot
    # arrays to a common maximum and passes each sequence's REAL range
    # bound here (traced), so measurements between a sequence's real end
    # and the padded range stay masked instead of reading frozen pad knots.
    t_hi: float | None = None


def build_layout(p: SplineProblem) -> blocks.BlockLayout:
    """Global tangent layout. Block ORDER is a performance contract: each
    measurement family's non-knot columns are CONTIGUOUS (accel ->
    bias_a|gravity|accl_intr, gyro -> bias_g|gyro_intr, reprojection ->
    q_i_c..time_offset), so the per-chunk Hessian blocks land in one
    static placement per region pair instead of one per block — the
    accumulate op count is what bounds the linearizer's dispatch time."""
    specs = [
        blocks.BlockSpec("q_so3", (p.n_so3, 4), "quat"),
        blocks.BlockSpec("t_r3", (p.n_r3, 3)),
        blocks.BlockSpec("bias_a", (p.n_bias, 3)),
        blocks.BlockSpec("gravity", (3,)),
        blocks.BlockSpec("accl_intr", (6,)),
        blocks.BlockSpec("bias_g", (p.n_bias, 3)),
        blocks.BlockSpec("gyro_intr", (9,)),
        blocks.BlockSpec("q_i_c", (4,), "quat"),
        blocks.BlockSpec("t_i_c", (3,)),
        blocks.BlockSpec("line_delay", (1,)),
        blocks.BlockSpec("time_offset", (1,)),
    ]
    if p.n_points > 0:
        specs.append(blocks.BlockSpec("points", (p.n_points, 3)))
    return blocks.BlockLayout(specs)


def identity_accl_intr(dtype=None):
    """[mis_yz, mis_zy, mis_zx, sx, sy, sz] (SetIMUIntrinsics packing,
    spline_trajectory_estimator.impl.h:1236-1248)."""
    return jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], precision.resolve(dtype))


def identity_gyro_intr(dtype=None):
    """[mis_yz, mis_zy, mis_zx, mis_xz, mis_xy, mis_yx, sx, sy, sz]."""
    return jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
                       precision.resolve(dtype))


def accl_intr_matrix(v):
    """T@K for the 'body-frame' accelerometer triad: upper-triangular
    misalignment x scale (ThreeAxisSensorCalibParams, types.h:176-218)."""
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([v[3], -v[0] * v[4], v[1] * v[5]]),
        jnp.stack([z, v[4], -v[2] * v[5]]),
        jnp.stack([z, z, v[5]]),
    ])


def gyro_intr_matrix(v):
    """T@K for the general gyroscope triad (full misalignment matrix)."""
    return jnp.stack([
        jnp.stack([v[6], -v[0] * v[7], v[1] * v[8]]),
        jnp.stack([v[3] * v[6], v[7], -v[2] * v[8]]),
        jnp.stack([-v[4] * v[6], v[5] * v[7], v[8]]),
    ])


def accl_intr_from(intr, dtype=None):
    """Pack a utils.types.ImuIntrinsics into the 6-vector accel parameter."""
    T, s = np.asarray(intr.misalignment), np.asarray(intr.scale)
    return jnp.asarray([-T[0, 1], T[0, 2], -T[1, 2], s[0], s[1], s[2]],
                       precision.resolve(dtype))


def gyro_intr_from(intr, dtype=None):
    """Pack a utils.types.ImuIntrinsics into the 9-vector gyro parameter."""
    T, s = np.asarray(intr.misalignment), np.asarray(intr.scale)
    return jnp.asarray([-T[0, 1], T[0, 2], -T[1, 2], T[1, 0], -T[2, 0], T[2, 1],
                        s[0], s[1], s[2]], dtype)


def flags_to_fixed(flags: frozenset) -> list:
    fixed = []
    if SPLINE not in flags:
        fixed += ["q_so3", "t_r3"]
    if T_I_C not in flags:
        fixed += ["q_i_c", "t_i_c"]
    if IMU_BIASES not in flags and ACC_BIAS not in flags:
        fixed += ["bias_a"]
    if IMU_BIASES not in flags and GYR_BIAS not in flags:
        fixed += ["bias_g"]
    if GRAVITY_DIR not in flags:
        fixed += ["gravity"]
    if CAM_LINE_DELAY not in flags:
        fixed += ["line_delay"]
    if TIME_OFFSET not in flags:
        fixed += ["time_offset"]
    if IMU_INTRINSICS not in flags:
        fixed += ["accl_intr", "gyro_intr"]
    if POINTS not in flags:
        fixed += ["points"]
    return fixed


# ---------------------------------------------------------------------------
# Local residuals (one measurement, local tangent delta)
# ---------------------------------------------------------------------------

def _windows(p: SplineProblem, t):
    """Window indices + local coords for one time (all three splines)."""
    i_s, u_s = spline.spline_coords(t, p.t0, p.dt_so3, p.n_so3, ORDER)
    i_r, u_r = spline.spline_coords(t, p.t0, p.dt_r3, p.n_r3, ORDER)
    i_b, u_b = spline.spline_coords(t, p.t0, p.dt_bias, p.n_bias, BIAS_ORDER)
    return (i_s, u_s), (i_r, u_r), (i_b, u_b)


def _in_range(p: SplineProblem, t):
    hi_s = p.t0 + (p.n_so3 - ORDER + 1) * p.dt_so3
    hi_r = p.t0 + (p.n_r3 - ORDER + 1) * p.dt_r3
    ok = (t >= p.t0) & (t < hi_s) & (t < hi_r)
    if p.t_hi is not None:
        ok = ok & (t < p.t_hi)
    return ok


def accel_residual_local(delta, qwin, rwin, bwin, gravity, intr, meas,
                         u_s, u_r, u_b, p: SplineProblem):
    """Accelerometer residual: R(t)^T (a_w + g) - T K (raw - bias_a(t))
    (AccelerationCostFunctorSplit, ceres_calib_split_residuals.h:23-104).
    delta layout: [18 so3 | 18 r3 | 9 bias | 3 gravity | 6 intr] = 54."""
    qw = lie.quat_boxplus(qwin, delta[0:18].reshape(6, 3))
    rw = rwin + delta[18:36].reshape(6, 3)
    bw = bwin + delta[36:45].reshape(3, 3)
    g = gravity + delta[45:48]
    M = accl_intr_matrix(intr + delta[48:54])
    q = spline.so3_eval(qw, u_s, ORDER)
    a_w = spline.r3_eval(rw, u_r, p.dt_r3, 2, ORDER)
    bias = spline.r3_eval(bw, u_b, p.dt_bias, 0, BIAS_ORDER)
    r = lie.quat_rotate(lie.quat_conjugate(q), a_w + g) - M @ (meas - bias)
    return p.w_accel * r


def gyro_residual_local(delta, qwin, bwin, intr, meas, u_s, u_b, p: SplineProblem):
    """Gyroscope residual: omega_body(t) - T K (raw - bias_g(t))
    (GyroCostFunctorSplit, ceres_calib_split_residuals.h:106-178).
    delta layout: [18 so3 | 9 bias | 9 intr] = 36."""
    qw = lie.quat_boxplus(qwin, delta[0:18].reshape(6, 3))
    bw = bwin + delta[18:27].reshape(3, 3)
    M = gyro_intr_matrix(intr + delta[27:36])
    _, omega = spline.so3_vel(qw, u_s, p.dt_so3, ORDER)
    bias = spline.r3_eval(bw, u_b, p.dt_bias, 0, BIAS_ORDER)
    return p.w_gyro * (omega - M @ (meas - bias))


def reproj_residual_local(delta, qwin, rwin, q_ic, t_ic, ld, toff, t_frame, row, uv, pt,
                          u_s_fn, p: SplineProblem, sqrt_info=None):
    """Reprojection residual (GS/RS CostFunctorSplit,
    ceres_calib_split_residuals.h:180-410). delta layout:
    [18 so3 | 18 r3 | 3 q_ic | 3 t_ic | 1 ld | 1 toff (| 3 point)] = 44/47.

    ``u_s_fn(t)`` maps an (autodiff-traced) capture time to in-segment
    coordinates, with the window index frozen by the caller. ``sqrt_info``
    (2, 2) whitens the pixel residual by the feature information
    (ceres_calib_split_residuals.h:276-277). With ``p.n_points > 0`` the
    observed board point is itself a parameter (POINTS flag).
    """
    qw = lie.quat_boxplus(qwin, delta[0:18].reshape(6, 3))
    rw = rwin + delta[18:36].reshape(6, 3)
    qic = lie.quat_boxplus(q_ic, delta[36:39])
    tic = t_ic + delta[39:42]
    ld_ = ld + delta[42]
    toff_ = toff + delta[43]
    if p.n_points > 0:
        pt = pt + delta[44:47]
    t_cap = t_frame + toff_ + (ld_ * row if p.rolling_shutter else 0.0)
    u_s, u_r = u_s_fn(t_cap)
    q_wi = spline.so3_eval(qw, u_s, ORDER)
    p_wi = spline.r3_eval(rw, u_r, p.dt_r3, 0, ORDER)
    q_wc, t_wc = lie.se3_compose(q_wi, p_wi, qic, tic)
    q_cw, t_cw = lie.se3_inverse(q_wc, t_wc)
    p_cam = lie.se3_act(q_cw, t_cw, pt)
    model = cameras.get_model(p.model_name)
    uv_pred, ok = model.project(p.cam_params, p_cam)
    r = uv_pred - uv
    if sqrt_info is not None:
        r = sqrt_info @ r
    # Invalid projection -> zero residual (solver-side mask), replacing the
    # reference's 1e10 sentinel (ceres_calib_split_residuals.h:272-274).
    return jnp.where(ok & (p_cam[2] > 1e-3), r, 0.0)


# ---------------------------------------------------------------------------
# Batched evaluation + assembly
# ---------------------------------------------------------------------------

def _gather_accel(params, p: SplineProblem):
    (i_s, u_s), (i_r, u_r), (i_b, u_b) = _windows(p, p.accel_t)
    qwin = spline.gather_window(params["q_so3"], i_s, ORDER)
    rwin = spline.gather_window(params["t_r3"], i_r, ORDER)
    bwin = spline.gather_window(params["bias_a"], i_b, BIAS_ORDER)
    return qwin, rwin, bwin, (i_s, u_s), (i_r, u_r), (i_b, u_b)


def _accel_eval(params, p: SplineProblem, with_jac: bool):
    """(r, J, (i_s, i_r, i_b)) for all accelerometer measurements."""
    qwin, rwin, bwin, (i_s, u_s), (i_r, u_r), (i_b, u_b) = _gather_accel(params, p)
    w = (p.accel_valid & _in_range(p, p.accel_t)).astype(p.accel_meas.dtype)

    def res(d, qw, rw, bw, m, us, ur, ub):
        return accel_residual_local(d, qw, rw, bw, params["gravity"],
                                    params["accl_intr"], m, us, ur, ub, p)

    d0 = jnp.zeros((54,), p.accel_meas.dtype)
    r = jax.vmap(lambda qw, rw, bw, m, us, ur, ub: res(d0, qw, rw, bw, m, us, ur, ub))(
        qwin, rwin, bwin, p.accel_meas, u_s, u_r, u_b) * w[:, None]
    J = None
    if with_jac:
        J = jax.vmap(lambda qw, rw, bw, m, us, ur, ub: jax.jacfwd(res)(d0, qw, rw, bw, m, us, ur, ub))(
            qwin, rwin, bwin, p.accel_meas, u_s, u_r, u_b) * w[:, None, None]
    return r, J, (i_s, i_r, i_b)


def _accel_r_and_idx(params, p: SplineProblem, layout, with_jac: bool):
    r, J, (i_s, i_r, i_b) = _accel_eval(params, p, with_jac)
    idx = jnp.concatenate([
        _win_idx(layout, "q_so3", i_s, ORDER),
        _win_idx(layout, "t_r3", i_r, ORDER),
        _win_idx(layout, "bias_a", i_b, BIAS_ORDER),
        _fixed_idx(layout, "gravity", i_s.shape[0]),
        _fixed_idx(layout, "accl_intr", i_s.shape[0]),
    ], axis=1)
    return r, J, idx


def _win_idx(layout, name, i0, order):
    """Global tangent indices of an order-window of a (K, d) block: (M, order*td)."""
    td = layout.by_name[name].tangent_shape[-1]
    base = layout.offsets[name] + (i0[:, None] + jnp.arange(order, dtype=i0.dtype)) * td
    return (base[:, :, None] + jnp.arange(td, dtype=i0.dtype)).reshape(i0.shape[0], order * td)


def _fixed_idx(layout, name, m):
    s = layout.slice_of(name)
    return jnp.broadcast_to(jnp.arange(s.start, s.stop), (m, s.stop - s.start))


def _gyro_eval(params, p: SplineProblem, with_jac: bool):
    """(r, J, (i_s, i_b)) for all gyroscope measurements."""
    (i_s, u_s), _, (i_b, u_b) = _windows(p, p.gyro_t)
    qwin = spline.gather_window(params["q_so3"], i_s, ORDER)
    bwin = spline.gather_window(params["bias_g"], i_b, BIAS_ORDER)
    w = (p.gyro_valid & _in_range(p, p.gyro_t)).astype(p.gyro_meas.dtype)

    def res(d, qw, bw, m, us, ub):
        return gyro_residual_local(d, qw, bw, params["gyro_intr"], m, us, ub, p)

    d0 = jnp.zeros((36,), p.gyro_meas.dtype)
    r = jax.vmap(lambda qw, bw, m, us, ub: res(d0, qw, bw, m, us, ub))(
        qwin, bwin, p.gyro_meas, u_s, u_b) * w[:, None]
    J = None
    if with_jac:
        J = jax.vmap(lambda qw, bw, m, us, ub: jax.jacfwd(res)(d0, qw, bw, m, us, ub))(
            qwin, bwin, p.gyro_meas, u_s, u_b) * w[:, None, None]
    return r, J, (i_s, i_b)


def _gyro_r_and_idx(params, p: SplineProblem, layout, with_jac: bool):
    r, J, (i_s, i_b) = _gyro_eval(params, p, with_jac)
    idx = jnp.concatenate([
        _win_idx(layout, "q_so3", i_s, ORDER),
        _win_idx(layout, "bias_g", i_b, BIAS_ORDER),
        _fixed_idx(layout, "gyro_intr", i_s.shape[0]),
    ], axis=1)
    return r, J, idx


def _reproj_eval(params, p: SplineProblem, with_jac: bool,
                 jac_mode: str = "rev"):
    """(r, J, (i_s, i_r)) for all reprojection observations.

    ``jac_mode``: "rev" (jacrev — faster on TPU: 2 residual rows vs 44
    tangent dims) for single-device use; "fwd" (jacfwd) inside shard_map
    bodies — reverse-mode under shard_map miscompiles on the XLA:CPU
    backend (observed: in-shard J off by 1e9 while residuals match;
    forward-mode is bit-correct there).
    """
    ld = params["line_delay"][0]
    toff = params["time_offset"][0]
    t_cap0 = p.obs_t + jax.lax.stop_gradient(toff) + (
        jax.lax.stop_gradient(ld) * p.obs_row if p.rolling_shutter else 0.0)
    # Freeze window indices at current line delay; u keeps the gradient.
    i_s, _ = spline.spline_coords(t_cap0, p.t0, p.dt_so3, p.n_so3, ORDER)
    i_r, _ = spline.spline_coords(t_cap0, p.t0, p.dt_r3, p.n_r3, ORDER)
    qwin = spline.gather_window(params["q_so3"], i_s, ORDER)
    rwin = spline.gather_window(params["t_r3"], i_r, ORDER)
    w = (p.obs_valid & _in_range(p, t_cap0)).astype(p.obs_uv.dtype)
    if p.n_points > 0:
        pts = params["points"][p.obs_pt_id]  # (Mo, 3) current point values
    else:
        pts = p.obs_pt
    si = p.obs_sqrt_info
    d_dim = 47 if p.n_points > 0 else 44

    def res(d, qw, rw, tf, row, uv, pt, iis, iir, s2):
        def u_fn(t_cap):
            u_s = (t_cap - p.t0) / p.dt_so3 - iis.astype(t_cap.dtype)
            u_r = (t_cap - p.t0) / p.dt_r3 - iir.astype(t_cap.dtype)
            return u_s, u_r

        return reproj_residual_local(d, qw, rw, params["q_i_c"], params["t_i_c"],
                                     ld, toff, tf, row, uv, pt, u_fn, p,
                                     sqrt_info=s2)

    d0 = jnp.zeros((d_dim,), p.obs_uv.dtype)
    si_axis = None if si is None else 0
    si_arg = si if si is not None else None
    in_axes = (0, 0, 0, 0, 0, 0, 0, 0, si_axis)
    args = (qwin, rwin, p.obs_t, p.obs_row, p.obs_uv, pts, i_s, i_r, si_arg)
    r = jax.vmap(lambda *a: res(d0, *a), in_axes=in_axes)(*args)
    r = r * w[:, None]
    J = None
    if with_jac:
        jac = jax.jacrev if jac_mode == "rev" else jax.jacfwd
        J = jax.vmap(lambda *a: jac(res)(d0, *a), in_axes=in_axes)(*args)
        J = J * w[:, None, None]
    return r, J, (i_s, i_r)


def _reproj_r_and_idx(params, p: SplineProblem, layout, with_jac: bool,
                      jac_mode: str = "rev"):
    r, J, (i_s, i_r) = _reproj_eval(params, p, with_jac, jac_mode)
    parts = [
        _win_idx(layout, "q_so3", i_s, ORDER),
        _win_idx(layout, "t_r3", i_r, ORDER),
        _fixed_idx(layout, "q_i_c", i_s.shape[0]),
        _fixed_idx(layout, "t_i_c", i_s.shape[0]),
        _fixed_idx(layout, "line_delay", i_s.shape[0]),
        _fixed_idx(layout, "time_offset", i_s.shape[0]),
    ]
    if p.n_points > 0:
        parts.append(layout.global_indices("points",
                                           p.obs_pt_id.astype(i_s.dtype)))
    idx = jnp.concatenate(parts, axis=1)
    return r, J, idx


def _point_prior_eval(params, p: SplineProblem, layout):
    """Gaussian prior on the points block: r = W (pt - prior_mean).

    Returns (r (P,3), J=W (P,3,3), idx (P,3)) or None when inactive. The
    prior both encodes the empirical board-point covariance
    (OptimizeBoardPoints, pose_estimator.cc:193-224) and pins the world
    gauge that freeing the points would otherwise open.
    """
    if p.n_points == 0 or p.pt_prior_sqrt_info is None:
        return None
    W = p.pt_prior_sqrt_info
    d = params["points"] - p.pt_prior_mean
    r = jnp.einsum("pij,pj->pi", W, d)
    idx = layout.global_indices("points",
                                jnp.arange(p.n_points, dtype=jnp.int32))
    return r, W, idx


def _scatter(H, g, r, J, idx, sqrt_w=None):
    """Accumulate J^T J blocks / J^T r into dense normal equations."""
    if sqrt_w is not None:
        r = r * sqrt_w[:, None]
        J = J * sqrt_w[:, None, None]
    Hb = jnp.einsum("mri,mrj->mij", J, J)
    gb = jnp.einsum("mri,mr->mi", J, r)
    H = H.at[idx[:, :, None], idx[:, None, :]].add(Hb)
    g = g.at[idx].add(gb)
    return H, g


def _obs_fields(p: SplineProblem) -> dict:
    """The per-observation arrays actually present in this problem."""
    d = dict(obs_t=p.obs_t, obs_row=p.obs_row, obs_uv=p.obs_uv,
             obs_pt=p.obs_pt, obs_valid=p.obs_valid)
    if p.obs_pt_id is not None:
        d["obs_pt_id"] = p.obs_pt_id
    if p.obs_sqrt_info is not None:
        d["obs_sqrt_info"] = p.obs_sqrt_info
    return d


def _obs_chunks(p: SplineProblem, chunk: int):
    """Reshape observation arrays to (K, chunk, ...) with invalid padding."""
    mo = p.obs_t.shape[0]
    k = (mo + chunk - 1) // chunk
    pad = k * chunk - mo

    def pz(x, value=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value).reshape((k, chunk) + x.shape[1:])

    return {name: pz(x, False if name == "obs_valid" else 0)
            for name, x in _obs_fields(p).items()}


# ---------------------------------------------------------------------------
# Chunk-local dense assembly (the fast TPU path)
#
# The straightforward assembly scatter-adds (M, F, F) Jacobian outer-product
# blocks into H — ~440M scattered elements per linearization at recording
# scale, which XLA executes catastrophically slowly inside the LM while_loop.
# Instead, measurements are time-sorted, so a contiguous chunk only touches a
# LOCAL window of knots. Per chunk we densify J into chunk-local coordinates
# (only M*F ~ 20M scattered elements in total), form H_local = J^T J on the
# MXU, and add H_local into H with dense dynamic-slice block updates.
# ---------------------------------------------------------------------------

def shard_map_jac_mode(mesh=None) -> str:
    """Jacobian mode for linearizers that run INSIDE shard_map bodies.

    Reverse-mode AD under shard_map miscompiles on the XLA:CPU backend
    (jax 0.9.0: in-shard reprojection J off by ~1e9 while residuals match;
    forward-mode is bit-correct there) — so 'fwd' on CPU. On TPU, 'rev' is
    the fast direction (2 residual rows vs 44 tangent dims per
    reprojection block) and shows no such miscompile.
    """
    platform = (mesh.devices.flat[0].platform if mesh is not None
                else jax.default_backend())
    return "fwd" if platform == "cpu" else "rev"


# SplineProblem scalar fields the linearizer/cost accept as TRACED
# per-problem values through the ``bases`` dict (multi-sequence batching:
# one compiled graph, per-sequence time origins, SEW weights, and bias-knot
# spacing — dt_bias only scales the bias-spline index/coordinate, never a
# derivative, since bias splines are evaluated at order 0).
PROBLEM_OVERRIDE_KEYS = ("t0", "w_accel", "w_gyro", "dt_bias", "t_hi")


class ChunkPlan(NamedTuple):
    """Static per-chunk window geometry for one measurement family."""

    n_chunks: int
    chunk: int
    w_s: int  # so3 knots covered by any chunk (incl. margin)
    w_r: int  # r3 knots (0 if unused)
    s_base: jnp.ndarray  # (K,) first so3 knot per chunk
    r_base: jnp.ndarray  # (K,)


def _plan_chunks(times: np.ndarray, p: SplineProblem, chunk: int,
                 use_r3: bool, margin: int = 2) -> ChunkPlan:
    """Host-side: compute per-chunk knot windows from concrete times."""
    t = np.asarray(times)
    m = t.shape[0]
    k = max(1, (m + chunk - 1) // chunk)
    i_s = np.clip(np.floor((t - p.t0) / p.dt_so3), 0, p.n_so3 - ORDER).astype(np.int64)
    i_r = np.clip(np.floor((t - p.t0) / p.dt_r3), 0, p.n_r3 - ORDER).astype(np.int64)
    s_base, r_base, spans_s, spans_r = [], [], [], []
    for c in range(k):
        sl = slice(c * chunk, min((c + 1) * chunk, m))
        cs = i_s[sl]
        cr = i_r[sl]
        s_base.append(max(int(cs.min()) - margin, 0))
        r_base.append(max(int(cr.min()) - margin, 0))
        spans_s.append(int(cs.max()) - s_base[-1] + ORDER + margin)
        spans_r.append(int(cr.max()) - r_base[-1] + ORDER + margin)
    w_s = min(max(spans_s), p.n_so3)
    w_r = min(max(spans_r), p.n_r3) if use_r3 else 0
    s_base = np.minimum(np.asarray(s_base), p.n_so3 - w_s).clip(0)
    r_base = np.minimum(np.asarray(r_base), p.n_r3 - max(w_r, 1)).clip(0)
    return ChunkPlan(n_chunks=k, chunk=chunk, w_s=int(w_s), w_r=int(w_r),
                     s_base=jnp.asarray(s_base, jnp.int32),
                     r_base=jnp.asarray(r_base, jnp.int32))


def _densify(r, J, local_idx, L):
    """(C, rd) residuals + (C, rd, F) blocks -> dense (C*rd, L) Jacobian.

    Generic scatter version (reference implementation; the hot path uses
    the scatter-free :func:`_densify_segments`, which profiled ~90x
    cheaper on TPU — the scatter here was 332 of the 377 ms linearize at
    GoPro-recording scale)."""
    C, rd, F = J.shape
    Jd = jnp.zeros((C * rd, L), J.dtype)
    rows = jnp.broadcast_to(jnp.arange(C * rd)[:, None], (C * rd, F)).reshape(C, rd, F)
    cols = jnp.broadcast_to(local_idx[:, None, :], (C, rd, F))
    Jd = Jd.at[rows, cols].add(J, unique_indices=True)
    return Jd, r.reshape(C * rd)


def _densify_segments(r, J, segments, L):
    """Scatter-free densification exploiting the block-window structure.

    Every measurement's local Jacobian is a few CONTIGUOUS runs of
    td-wide blocks (a knot window starting at a per-measurement block
    index) plus fixed tail columns. Placing a run into its region is a
    tiny batched matmul against a per-measurement block one-hot — MXU
    work instead of a 20M-element scatter (the TPU scatter path measured
    ~330 ms per linearize at recording scale; this is ~3 ms).

    segments: layout-ordered list of
      ("run", col0, nblk, td, blk_idx (C,), wblk) — J[:, :, col0:col0+nblk*td]
          holds nblk td-wide blocks; block k of measurement m lands at
          block position blk_idx[m]+k of a wblk-block region, and
      ("fixed", col0, ncols) — contiguous columns shared by all
          measurements.
    Regions are concatenated in order; their total width must equal L.
    """
    C, rd, F = J.shape
    segs = []
    width = 0
    for seg in segments:
        if seg[0] == "run":
            _, col0, nblk, td, blk_idx, wblk = seg
            Jr = J[:, :, col0:col0 + nblk * td].reshape(C, rd, nblk, td)
            tgt = blk_idx[:, None].astype(jnp.int32) + jnp.arange(nblk, dtype=jnp.int32)
            oh = (tgt[:, :, None] == jnp.arange(wblk, dtype=jnp.int32)).astype(J.dtype)
            Jw = jnp.einsum("mrkc,mkw->mrwc", Jr, oh)  # (C, rd, wblk, td)
            segs.append(Jw.reshape(C, rd, wblk * td))
            width += wblk * td
        else:
            _, col0, ncols = seg
            segs.append(J[:, :, col0:col0 + ncols])
            width += ncols
    assert width == L, (width, L)
    return jnp.concatenate(segs, axis=-1).reshape(C * rd, L), r.reshape(C * rd)


def _chunk_arrays(arrs: dict, chunk: int, pad_values: dict):
    """Pad leading axis to n_chunks*chunk and reshape to (K, chunk, ...)."""
    m = next(iter(arrs.values())).shape[0]
    k = max(1, (m + chunk - 1) // chunk)
    pad = k * chunk - m
    out = {}
    for name, x in arrs.items():
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        out[name] = jnp.pad(x, cfg, constant_values=pad_values.get(name, 0)).reshape(
            (k, chunk) + x.shape[1:])
    return out


def make_solver_functions(p: SplineProblem, layout, reproj_chunk: int | None = None,
                          include_prior: bool = True, jac_mode: str = "rev"):
    """(linearize_fn, cost_fn) for lm.lm_optimize, both jit-traceable.

    ``reproj_chunk``: if set, reprojection blocks are assembled in a
    lax.scan over chunks of that many observations, bounding the peak
    memory of the (M, 44, 44) block/index buffers (needed at full
    GoPro-recording scale: ~230k observations).

    ``include_prior``: sharded callers pass False and add the board-point
    prior ONCE after the cross-device reduction (a per-device prior would
    be multiplied by the mesh size under psum).
    """

    def cost_fn(params):
        ra, _, _ = _accel_r_and_idx(params, p, layout, with_jac=False)
        rg, _, _ = _gyro_r_and_idx(params, p, layout, with_jac=False)
        rp, _, _ = _reproj_r_and_idx(params, p, layout, with_jac=False)
        c = 0.5 * jnp.sum(ra * ra) + 0.5 * jnp.sum(rg * rg)
        c = c + robust.huber_cost(rp.reshape(-1), HUBER_PX, group_size=2)
        if include_prior:
            prior = _point_prior_eval(params, p, layout)
            if prior is not None:
                c = c + 0.5 * jnp.sum(prior[0] ** 2)
        return c

    def linearize_fn(params):
        D = layout.tangent_dim
        dtype = p.obs_uv.dtype
        H = jnp.zeros((D, D), dtype)
        g = jnp.zeros((D,), dtype)
        ra, Ja, ia = _accel_r_and_idx(params, p, layout, with_jac=True)
        H, g = _scatter(H, g, ra, Ja, ia)
        rg, Jg, ig = _gyro_r_and_idx(params, p, layout, with_jac=True)
        H, g = _scatter(H, g, rg, Jg, ig)
        cost = 0.5 * jnp.sum(ra * ra) + 0.5 * jnp.sum(rg * rg)
        prior = _point_prior_eval(params, p, layout) if include_prior else None
        if prior is not None:
            rq, Wq, iq = prior
            H, g = _scatter(H, g, rq, Wq, iq)
            cost = cost + 0.5 * jnp.sum(rq * rq)

        if reproj_chunk is None:
            rp, Jp, ip = _reproj_r_and_idx(params, p, layout, with_jac=True,
                                            jac_mode=jac_mode)
            hw = robust.huber_sqrt_weights(rp.reshape(-1), HUBER_PX, group_size=2)
            hw = hw.reshape(rp.shape)[:, 0]
            H, g = _scatter(H, g, rp, Jp, ip, sqrt_w=hw)
            cost = cost + robust.huber_cost(rp.reshape(-1), HUBER_PX, group_size=2)
        else:
            chunks = _obs_chunks(p, reproj_chunk)

            def body(carry, ch):
                Hc, gc, cc = carry
                pc = p._replace(**ch)
                rp, Jp, ip = _reproj_r_and_idx(params, pc, layout, with_jac=True,
                                                jac_mode=jac_mode)
                hw = robust.huber_sqrt_weights(rp.reshape(-1), HUBER_PX, group_size=2)
                hw = hw.reshape(rp.shape)[:, 0]
                Hc, gc = _scatter(Hc, gc, rp, Jp, ip, sqrt_w=hw)
                cc = cc + robust.huber_cost(rp.reshape(-1), HUBER_PX, group_size=2)
                return (Hc, gc, cc), None

            (H, g, cost), _ = jax.lax.scan(body, (H, g, cost), chunks)
        return H, g, cost

    return linearize_fn, cost_fn


def plan_fast_assembly(p: SplineProblem, obs_chunk: int = 2048,
                       imu_chunk: int = 256):
    """Host-side planning for the chunk-local assembly: (plans, arrs).

    plans = (obs_plan, acc_plan, gyr_plan); arrs = dict of chunked
    (K, chunk, ...) measurement arrays. Separated from the traced body so
    the sharded solver (parallel/sharded.py) can plan per device shard and
    feed device-local bases/arrays through ``shard_map``.
    """
    obs_plan = _plan_chunks(np.asarray(p.obs_t), p, obs_chunk, use_r3=True)
    acc_plan = _plan_chunks(np.asarray(p.accel_t), p, imu_chunk, use_r3=True)
    gyr_plan = _plan_chunks(np.asarray(p.gyro_t), p, imu_chunk, use_r3=False)

    arrs = {}
    arrs.update(_chunk_arrays(_obs_fields(p), obs_plan.chunk,
                              {"obs_valid": False}))
    arrs.update(_chunk_arrays(
        dict(accel_t=p.accel_t, accel_meas=p.accel_meas, accel_valid=p.accel_valid),
        acc_plan.chunk, {"accel_valid": False}))
    arrs.update(_chunk_arrays(
        dict(gyro_t=p.gyro_t, gyro_meas=p.gyro_meas, gyro_valid=p.gyro_valid),
        gyr_plan.chunk, {"gyro_valid": False}))
    return (obs_plan, acc_plan, gyr_plan), arrs


def make_fast_linearizer(p: SplineProblem, layout, plans,
                         include_prior: bool = True, jac_mode: str = "rev",
                         sequential: bool = False,
                         gram_dtype=None, gram_kernel: str = "xla"):
    """Traced chunk-local linearizer: ``lin(params, arrs, bases) -> (H, g, cost)``.

    ``arrs`` is the chunked-array dict from :func:`plan_fast_assembly` (or a
    device-local shard of it); ``bases`` is a dict with keys obs_s/obs_r/
    acc_s/acc_r/gyr_s giving the per-chunk first-knot indices (static plan
    values by default, traced device-local arrays under shard_map).

    ``sequential``: evaluate chunks in a ``lax.scan`` (bounded peak memory,
    one chunk's AD buffers live at a time) instead of the default ``vmap``
    over the chunk axis. The vmap path is what keeps the TPU busy: the r3
    design's scan issued ~160 *sequential* chunk steps per linearization,
    each a sub-millisecond sliver of VPU/MXU work, so the wall clock was
    dispatch latency (127 ms at DS3 scale for 0.5 GFLOP). Batching the
    chunk axis turns the per-chunk Gram products into one large batched
    matmul and the AD chains into full-width elementwise ops. Peak memory
    grows by ~n_chunks x per-chunk buffers (~hundreds of MB at recording
    scale) which HBM comfortably holds.
    """
    obs_plan, acc_plan, gyr_plan = plans
    dtype = p.obs_uv.dtype
    nb3 = 3 * p.n_bias

    def _gram(Jd, rf):
        """(H_local, g_local) from the densified chunk Jacobian.

        ``gram_dtype`` (e.g. jnp.bfloat16) casts the Gram matmul operands
        while accumulating in the problem dtype — the Gram is the MXU-
        dominant op AND the source of the layout-copy traffic around the
        (C*rd, L) buffers (r4 v5e profile: 11.4 ms of 35 ms device time
        was `copy`, 4.6 ms the f32 Gram). H only preconditions the LM
        step; the gradient g and the cost stay in full precision, so
        reduced H precision costs at most extra damping retries — the
        fused gain-ratio loop measures the actual decrease exactly.
        """
        if gram_dtype is None:
            return Jd.T @ Jd, Jd.T @ rf
        Jc = Jd.astype(gram_dtype)
        H = jnp.dot(Jc.T, Jc, preferred_element_type=dtype)
        g = jnp.einsum("ml,m->l", Jd, rf)
        return H, g

    def _densify_gram(r, J, segments, L):
        """Densify + Gram, either as the two XLA steps or as the fused
        Pallas kernel (``gram_kernel="pallas"``): the kernel builds each
        row tile's dense Jacobian in VMEM and contracts it on the MXU
        without the HBM round trip of the (C*rd, L) buffer
        (solver/pallas_gram.py; always float32)."""
        if gram_kernel == "pallas":
            from openimucameracalibrator_tpu.solver import pallas_gram
            C, rd, F = J.shape
            static, idxs, off = [], [], 0
            for seg in segments:
                if seg[0] == "run":
                    _, col0, nblk, td, blk_idx, wblk = seg
                    static.append(("run", col0, nblk, td, wblk, off))
                    idxs.append(jnp.repeat(
                        jnp.asarray(blk_idx, jnp.int32), rd))
                    off += wblk * td
                else:
                    _, col0, ncols = seg
                    static.append(("fixed", col0, ncols, off))
                    off += ncols
            assert off == L, (off, L)
            fused = pallas_gram.make_fused_gram(
                tuple(static), L, C * rd, F,
                interpret=jax.default_backend() != "tpu")
            H, g = fused(J.reshape(C * rd, F), r.reshape(C * rd), *idxs)
            return H.astype(dtype), g.astype(dtype)
        Jd, rf = _densify_segments(r, J, segments, L)
        return _gram(Jd, rf)
    np3 = 3 * p.n_points  # points are chunk-global: every chunk sees all P

    # Local tangent layout sizes.
    L_obs = 3 * obs_plan.w_s + 3 * obs_plan.w_r + 8 + np3
    L_acc = 3 * acc_plan.w_s + 3 * acc_plan.w_r + nb3 + 3 + 6
    L_gyr = 3 * gyr_plan.w_s + nb3 + 9

    off = layout.offsets

    def _clip_local(i, base, w):
        return jnp.clip(i - base, 0, w - ORDER).astype(jnp.int32)

    def _reproj_chunk(params, ch, s_base, r_base, s_org=0, r_org=0, pov=None):
        pc = p._replace(**ch, **(pov or {}))
        r, J, (i_s, i_r) = _reproj_eval(params, pc, with_jac=True,
                                        jac_mode=jac_mode)
        c = robust.huber_cost(r.reshape(-1), HUBER_PX, group_size=2)
        hw = robust.huber_sqrt_weights(r.reshape(-1), HUBER_PX, group_size=2)
        hw = hw.reshape(r.shape)[:, 0]
        r = r * hw[:, None]
        J = J * hw[:, None, None]
        tail0 = 3 * obs_plan.w_s + 3 * obs_plan.w_r
        segments = [
            ("run", 0, ORDER, 3, _clip_local(i_s, s_base, obs_plan.w_s),
             obs_plan.w_s),
            ("run", 18, ORDER, 3, _clip_local(i_r, r_base, obs_plan.w_r),
             obs_plan.w_r),
            ("fixed", 36, 8),
        ]
        if p.n_points > 0:
            segments.append(("run", 44, 1, 3, pc.obs_pt_id.astype(jnp.int32),
                             p.n_points))
        Hl, gl = _densify_gram(r, J, segments, L_obs)
        return Hl, gl, c

    def _accel_chunk(params, ch, s_base, r_base, s_org=0, r_org=0, pov=None):
        pc = p._replace(**ch, **(pov or {}))
        r, J, (i_s, i_r, i_b) = _accel_eval(params, pc, with_jac=True)
        segments = [
            ("run", 0, ORDER, 3, _clip_local(i_s, s_base, acc_plan.w_s),
             acc_plan.w_s),
            ("run", 18, ORDER, 3, _clip_local(i_r, r_base, acc_plan.w_r),
             acc_plan.w_r),
            ("run", 36, BIAS_ORDER, 3, i_b.astype(jnp.int32), p.n_bias),
            ("fixed", 45, 9),
        ]
        Hl, gl = _densify_gram(r, J, segments, L_acc)
        return Hl, gl, 0.5 * jnp.sum(r * r)

    def _gyro_chunk(params, ch, s_base, s_org=0, pov=None):
        pc = p._replace(**ch, **(pov or {}))
        r, J, (i_s, i_b) = _gyro_eval(params, pc, with_jac=True)
        segments = [
            ("run", 0, ORDER, 3, _clip_local(i_s, s_base, gyr_plan.w_s),
             gyr_plan.w_s),
            ("run", 18, BIAS_ORDER, 3, i_b.astype(jnp.int32), p.n_bias),
            ("fixed", 27, 9),
        ]
        Hl, gl = _densify_gram(r, J, segments, L_gyr)
        return Hl, gl, 0.5 * jnp.sum(r * r)

    def _region_idx(starts_list):
        """(K, L) global tangent index per chunk-local coordinate.

        starts_list: layout-ordered [(region_start (K,) or scalar, width)].
        Scatter indices replace the old per-chunk dynamic-update-slice
        accumulation, whose updates copied the full D x D carry each time
        (~160 us x 224 updates = most of the old accumulate cost)."""
        parts = [jnp.asarray(start, jnp.int32).reshape(-1, 1)
                 + jnp.arange(width, dtype=jnp.int32)
                 for start, width in starts_list]
        K = max(pt.shape[0] for pt in parts)
        return jnp.concatenate(
            [jnp.broadcast_to(pt, (K, pt.shape[1])) for pt in parts], axis=1)

    def _accumulate(H, g, Hls, gls, idx):
        H = H.at[idx[:, :, None], idx[:, None, :]].add(Hls)
        g = g.at[idx].add(gls)
        return H, g

    def _accumulate_static(H, g, Hls, gls, starts_list):
        """Scatter-free accumulation for host-concrete chunk bases.

        XLA:TPU lowers the indexed scatter-add above through a sort-based
        custom kernel that dominated the whole linearization (~43 of 85 ms
        device time at DS3 scale, profiled on v5e: fusion over the
        flattened (D*D,) Hessian + 2 sorts per family). When every chunk's
        target offset is known at trace time, the same accumulation is a
        chain of STATIC dynamic-update-slice adds — one per (chunk,
        region-pair) — which XLA fuses into a single assembly pass
        (measured ~0.03 ms for the obs family's 111x77x77 blocks).
        """
        starts = [(np.asarray(s).reshape(-1), int(w)) for s, w in starts_list]
        offs = np.concatenate([[0], np.cumsum([w for _, w in starts])])
        K = Hls.shape[0]
        for k in range(K):
            pos = [int(s[k % len(s)] if len(s) > 1 else s[0])
                   for s, _ in starts]
            for a, (_, wa) in enumerate(starts):
                ra, pa = int(offs[a]), pos[a]
                g = g.at[pa:pa + wa].add(gls[k, ra:ra + wa])
                for b, (_, wb) in enumerate(starts):
                    rb, pb = int(offs[b]), pos[b]
                    H = H.at[pa:pa + wa, pb:pb + wb].add(
                        Hls[k, ra:ra + wa, rb:rb + wb])
        return H, g

    def _concrete_starts(starts_list):
        """np version of starts_list if every entry is host-concrete."""
        out = []
        for s, w in starts_list:
            if isinstance(s, jax.core.Tracer):
                return None
            out.append((np.asarray(s), int(w)))
        return out

    def _acc_dispatch(H, g, Hls, gls, starts_list):
        cs = _concrete_starts(starts_list)
        if cs is not None:
            return _accumulate_static(H, g, Hls, gls, cs)
        return _accumulate(H, g, Hls, gls, _region_idx(starts_list))

    def linearize(params, arrs, bases):
        D = layout.tangent_dim
        H = jnp.zeros((D, D), dtype)
        g = jnp.zeros((D,), dtype)
        # Knot-window origin of the target H: 0 for the global layout;
        # the device's first owned-window knot for the knot-sharded local
        # layouts (parallel/schur.py).
        s_org = bases.get("s_org", 0)
        r_org = bases.get("r_org", 0)
        # Per-problem overrides of SplineProblem scalars (traced per-sequence
        # values for the multi-sequence batch: each sequence carries its own
        # time origin and SEW weights through one common compiled graph).
        pov = {k: bases[k] for k in PROBLEM_OVERRIDE_KEYS if k in bases} or None

        def _c(x):
            """Host (numpy) view of a chunk-base value when it is concrete.

            Inside a jit trace, jnp arithmetic on CONCRETE closure arrays
            still yields tracers — the accumulate-target offsets must be
            computed in numpy to stay host-known, which is what lets
            _acc_dispatch pick the scatter-free static placement.
            """
            if isinstance(x, (int, np.integer, np.ndarray)):
                return x
            if isinstance(x, jax.core.Tracer):
                return x
            return np.asarray(x)

        s_orgc, r_orgc = _c(s_org), _c(r_org)

        def _map_chunks(body, xs):
            """(H_l (K,L,L), g_l (K,L), total cost) over the chunk axis."""
            if sequential:
                def sbody(cc, x):
                    H_l, g_l, c = body(*x)
                    return cc + c, (H_l, g_l)

                cc, (Hs, gs) = jax.lax.scan(sbody, jnp.zeros((), dtype), xs)
                return Hs, gs, cc
            Hs, gs, cs = jax.vmap(body)(*xs)
            return Hs, gs, jnp.sum(cs)

        acc_arrs = {k: arrs[k] for k in ("accel_t", "accel_meas", "accel_valid")}
        Ha, ga, cost = _map_chunks(
            lambda ch, sb, rb: _accel_chunk(params, ch, sb, rb, s_org, r_org,
                                            pov),
            (acc_arrs, bases["acc_s"], bases["acc_r"]))
        H, g = _acc_dispatch(H, g, Ha, ga, [
            (3 * (_c(bases["acc_s"]) - s_orgc), 3 * acc_plan.w_s),
            (off["t_r3"] + 3 * (_c(bases["acc_r"]) - r_orgc),
             3 * acc_plan.w_r),
            # bias_a | gravity | accl_intr: contiguous by layout contract.
            (off["bias_a"], nb3 + 9)])

        gyr_arrs = {k: arrs[k] for k in ("gyro_t", "gyro_meas", "gyro_valid")}
        Hg, gg, c_g = _map_chunks(
            lambda ch, sb: _gyro_chunk(params, ch, sb, s_org, pov),
            (gyr_arrs, bases["gyr_s"]))
        cost = cost + c_g
        H, g = _acc_dispatch(H, g, Hg, gg, [
            (3 * (_c(bases["gyr_s"]) - s_orgc), 3 * gyr_plan.w_s),
            # bias_g | gyro_intr: contiguous by layout contract.
            (off["bias_g"], nb3 + 9)])

        obs_keys = tuple(_obs_fields(p).keys())
        obs_arrs = {k: arrs[k] for k in obs_keys}
        Ho, go, c_o = _map_chunks(
            lambda ch, sb, rb: _reproj_chunk(params, ch, sb, rb, s_org, r_org,
                                             pov),
            (obs_arrs, bases["obs_s"], bases["obs_r"]))
        cost = cost + c_o
        starts_o = [
            (3 * (_c(bases["obs_s"]) - s_orgc), 3 * obs_plan.w_s),
            (off["t_r3"] + 3 * (_c(bases["obs_r"]) - r_orgc),
             3 * obs_plan.w_r),
            (off["q_i_c"], 8)]
        if p.n_points > 0:
            starts_o.append((off["points"], np3))
        H, g = _acc_dispatch(H, g, Ho, go, starts_o)

        prior = _point_prior_eval(params, p, layout) if include_prior else None
        if prior is not None:
            rq, Wq, iq = prior
            H, g = _scatter(H, g, rq, Wq, iq)
            cost = cost + 0.5 * jnp.sum(rq * rq)
        return H, g, cost

    return linearize


def plan_bases(plans) -> dict:
    obs_plan, acc_plan, gyr_plan = plans
    return dict(obs_s=obs_plan.s_base, obs_r=obs_plan.r_base,
                acc_s=acc_plan.s_base, acc_r=acc_plan.r_base,
                gyr_s=gyr_plan.s_base)


def make_solver_functions_fast(p: SplineProblem, layout,
                               obs_chunk: int = 4096, imu_chunk: int = 256,
                               gram_dtype=None, gram_kernel: str = "xla"):
    """(linearize_fn, cost_fn) using chunk-local dense assembly (see above).

    Produces the same (H, g, cost) as :func:`make_solver_functions` (tested
    to numerical precision) but orders of magnitude faster inside the LM
    loop on TPU: block-one-hot matmul densification (no large scatters),
    vmapped per-chunk MXU Gram matrices, and a scatter-free static-DUS
    accumulation into H. Chunk defaults swept on a real v5e at
    GoPro-DS3 scale (r4: obs 4096 / imu 256 = 64 ms per linearize, vs
    124 ms for the r3 scan+scatter design and 377 ms for r2; larger
    chunks lose to the O(L^2) window growth of the per-chunk Gram).
    """
    plans, arrs = plan_fast_assembly(p, obs_chunk, imu_chunk)
    lin = make_fast_linearizer(p, layout, plans, gram_dtype=gram_dtype,
                               gram_kernel=gram_kernel)
    bases = plan_bases(plans)

    def linearize_fn(params):
        return lin(params, arrs, bases)

    def cost_fn(params):
        ra, _, _ = _accel_eval(params, p, with_jac=False)
        rg, _, _ = _gyro_eval(params, p, with_jac=False)
        rp, _, _ = _reproj_eval(params, p, with_jac=False)
        c = 0.5 * jnp.sum(ra * ra) + 0.5 * jnp.sum(rg * rg)
        c = c + robust.huber_cost(rp.reshape(-1), HUBER_PX, group_size=2)
        prior = _point_prior_eval(params, p, build_layout(p))
        if prior is not None:
            c = c + 0.5 * jnp.sum(prior[0] ** 2)
        return c

    return linearize_fn, cost_fn


# ---------------------------------------------------------------------------
# Problem construction + initialization
# ---------------------------------------------------------------------------

def _num_knots(duration: float, dt: float, order: int) -> int:
    return int(np.ceil(duration / dt)) + order - 1


def init_spline_params(poses: PoseDataset, q_i_c0, t_i_c0, p: SplineProblem,
                       imu: ImuData, pose_time_offset: float = 0.0,
                       dtype=None):
    """Initialize knots from camera poses (BatchInitSO3R3VisPoses,
    spline_trajectory_estimator.impl.h:278-339) and gravity from early
    accelerometer samples (InitializeGravity, imu_camera_calibrator.cc:130-161).

    ``pose_time_offset`` shifts the pose timestamps onto the IMU clock.
    """
    dtype = precision.resolve(dtype)
    t0, dt_so3, dt_r3 = p.t0, p.dt_so3, p.dt_r3
    n_so3, n_r3, n_bias = p.n_so3, p.n_r3, p.n_bias
    ok = poses.valid
    tv = poses.times[ok] + pose_time_offset
    q_wc = jnp.asarray(poses.q_w_c[ok], dtype)
    t_wc = jnp.asarray(poses.t_w_c[ok], dtype)
    # T_w_i = T_w_c * T_i_c^{-1} (impl.h:296-300)
    q_ci, t_ci = lie.se3_inverse(jnp.asarray(q_i_c0, dtype), jnp.asarray(t_i_c0, dtype))
    q_wi, t_wi = jax.vmap(lambda q, t: lie.se3_compose(q, t, q_ci, t_ci))(q_wc, t_wc)
    # Fix quaternion hemisphere continuity before slerp resampling.
    qn = np.array(q_wi)
    for k in range(1, qn.shape[0]):
        if np.dot(qn[k], qn[k - 1]) < 0:
            qn[k] = -qn[k]
    q_wi = jnp.asarray(qn)
    tvj = jnp.asarray(tv, dtype)
    knot_t_so3 = t0 + jnp.arange(n_so3, dtype=dtype) * dt_so3 - (ORDER - 1) * dt_so3 / 2.0
    knot_t_r3 = t0 + jnp.arange(n_r3, dtype=dtype) * dt_r3 - (ORDER - 1) * dt_r3 / 2.0
    q_knots = interpolation.interp_quaternion(tvj, q_wi, knot_t_so3)
    t_knots = interpolation.interp_vector(tvj, t_wi, knot_t_r3)

    # Gravity: average R_w_i(t) * accel over samples near the first poses
    # (assumes low body acceleration there).
    sel = (imu.times >= tv[0]) & (imu.times <= tv[0] + 1.0)
    acc = jnp.asarray(imu.accel[sel], dtype)
    t_acc = jnp.asarray(imu.times[sel], dtype)
    q_at = interpolation.interp_quaternion(tvj, q_wi, t_acc)
    g_est = jnp.mean(lie.quat_rotate(q_at, acc), axis=0)
    g_est = 9.81 * g_est / jnp.maximum(jnp.linalg.norm(g_est), 1e-9)

    out = {
        "q_so3": q_knots,
        "t_r3": t_knots,
        "bias_a": jnp.zeros((n_bias, 3), dtype),
        "bias_g": jnp.zeros((n_bias, 3), dtype),
        "gravity": g_est,
        "q_i_c": jnp.asarray(q_i_c0, dtype),
        "t_i_c": jnp.asarray(t_i_c0, dtype),
        "line_delay": jnp.zeros((1,), dtype),
        "time_offset": jnp.zeros((1,), dtype),
        "accl_intr": identity_accl_intr(dtype),
        "gyro_intr": identity_gyro_intr(dtype),
    }
    if p.n_points > 0:
        out["points"] = jnp.asarray(p.pt_prior_mean, dtype)
    return out


def build_problem(corners: CornerDataset, calib: CameraCalibration,
                  imu: ImuData, sew: SplineWeightingData,
                  time_offset: float, rolling_shutter: bool,
                  dtype=None) -> SplineProblem:
    """Assemble measurement batches. Corner times are shifted by
    ``time_offset`` onto the IMU clock (t_imu = t_cam + offset)."""
    dtype = precision.resolve(dtype)
    cam_t = corners.times + time_offset
    t_lo = max(float(imu.times[0]), float(cam_t.min()))
    t_hi = min(float(imu.times[-1]), float(cam_t.max()))
    duration = t_hi - t_lo
    n_so3 = _num_knots(duration, sew.dt_so3, ORDER)
    n_r3 = _num_knots(duration, sew.dt_r3, ORDER)
    dt_bias = min(10.0, duration)  # imu_camera_calibrator.cc:80-85
    n_bias = _num_knots(duration, dt_bias, BIAS_ORDER)

    V, P = corners.points2d.shape[:2]
    obs_t = np.repeat(cam_t, P)
    obs_row = corners.points2d[..., 1].reshape(-1)
    obs_uv = corners.points2d.reshape(-1, 2)
    obs_pt = np.tile(corners.board_points, (V, 1))
    obs_valid = corners.valid.reshape(-1)

    return SplineProblem(
        t0=t_lo, dt_so3=sew.dt_so3, dt_r3=sew.dt_r3, dt_bias=dt_bias,
        n_so3=n_so3, n_r3=n_r3, n_bias=n_bias,
        accel_t=jnp.asarray(imu.times, dtype), accel_meas=jnp.asarray(imu.accel, dtype),
        accel_valid=jnp.ones(imu.times.shape[0], bool), w_accel=1.0 / sew.std_r3,
        gyro_t=jnp.asarray(imu.times, dtype), gyro_meas=jnp.asarray(imu.gyro, dtype),
        gyro_valid=jnp.ones(imu.times.shape[0], bool), w_gyro=1.0 / sew.std_so3,
        obs_t=jnp.asarray(obs_t, dtype), obs_row=jnp.asarray(obs_row, dtype),
        obs_uv=jnp.asarray(obs_uv, dtype), obs_pt=jnp.asarray(obs_pt, dtype),
        obs_valid=jnp.asarray(obs_valid),
        cam_params=jnp.asarray(calib.params, dtype), model_name=calib.model_name,
        rolling_shutter=rolling_shutter)


def enable_board_points(p: SplineProblem, *, point_prior_std: float = 1e-3,
                        point_cov: np.ndarray | None = None,
                        reproj_cov: np.ndarray | None = None,
                        board_points: np.ndarray | None = None,
                        obs_pt_id: np.ndarray | None = None) -> SplineProblem:
    """Activate the POINTS parameter block on an assembled problem.

    Mirrors the reference's POINTS flag + feature covariance machinery:
    board points become optimization parameters
    (spline_trajectory_estimator.h:17-27), reprojection residuals are
    whitened by the per-feature covariance
    (ceres_calib_split_residuals.h:276-277,395-396), and the empirical
    board-point covariance of OptimizeBoardPoints
    (src/core/pose_estimator.cc:193-224) becomes a Gaussian prior pinning
    each point (which also pins the world gauge that freeing the board
    would otherwise open).

    ``point_cov``  — (P, 3, 3) prior covariance per point; default
                     isotropic ``point_prior_std``² I.
    ``reproj_cov`` — (P, 2, 2) per-point feature covariance in px²;
                     default identity (no whitening).
    ``board_points``/``obs_pt_id`` — the explicit contract: the (P, 3)
    board geometry and a (Mo,) int index mapping each observation to its
    point. When omitted, both are inferred from the view-major tiling
    ``build_problem`` produces (obs_pt = tile(board_points, (V, 1)));
    datasets with per-view variable boards (image folders, pruned
    corners) must pass them explicitly.
    """
    mo = int(p.obs_t.shape[0])
    bp0 = np.asarray(p.obs_pt)
    if board_points is not None and obs_pt_id is not None:
        pts = np.asarray(board_points)
        P = int(pts.shape[0])
        ids = np.asarray(obs_pt_id, np.int32)
        if ids.shape[0] != mo:
            raise ValueError(f"obs_pt_id has {ids.shape[0]} entries for "
                             f"{mo} observations")
        if ids.min() < 0 or ids.max() >= P:
            raise ValueError("obs_pt_id indexes outside the board")
        obs_pt_id = jnp.asarray(ids)
    elif board_points is not None or obs_pt_id is not None:
        raise ValueError("pass board_points and obs_pt_id together")
    else:
        # Infer P from the tiling: obs_pt is np.tile(board_points, (V, 1)).
        P = None
        # Find the tile period: first index where the full prefix repeats.
        for cand in range(1, mo + 1):
            if mo % cand == 0 and np.array_equal(bp0[:cand], bp0[cand:2 * cand]) \
                    and np.allclose(bp0, np.tile(bp0[:cand], (mo // cand, 1))):
                P = cand
                break
        if P is None:
            raise ValueError(
                "observations are not a per-view tiling of one board; pass "
                "board_points and obs_pt_id explicitly")
        pts = bp0[:P]
        obs_pt_id = jnp.asarray(np.tile(np.arange(P, dtype=np.int32), mo // P))

    dtype = p.obs_uv.dtype

    def _sqrt_info(cov, floor):
        # W = inv(chol(cov))^T so that W^T W = cov^{-1}; a variance floor
        # keeps near-singular empirical covariances factorizable.
        cov = np.asarray(cov, np.float64)
        cov = cov + floor * np.eye(cov.shape[-1])
        L = np.linalg.cholesky(cov)
        return np.transpose(np.linalg.inv(L), (0, 2, 1))

    if point_cov is None:
        W = np.broadcast_to(np.eye(3) / point_prior_std, (P, 3, 3)).copy()
    else:
        W = _sqrt_info(point_cov, 1e-10)  # 10 um std floor
    sqrt_info = None
    if reproj_cov is not None:
        Sr = _sqrt_info(reproj_cov, 1e-4)  # 0.01 px std floor, (P, 2, 2)
        # Per-observation whitening gathered through obs_pt_id (works for
        # both tiled and explicit observation layouts).
        sqrt_info = jnp.asarray(Sr, dtype)[obs_pt_id]

    return p._replace(n_points=P, obs_pt_id=obs_pt_id,
                      obs_sqrt_info=sqrt_info,
                      pt_prior_mean=jnp.asarray(pts, dtype),
                      pt_prior_sqrt_info=jnp.asarray(W, dtype))


# Below this tangent dimension the dense damped Cholesky wins on TPU.
# Measured on v5e (bench.py banded_regime stage, r4 sweep):
#   D= 5,723 ( 60 s): dense 32.0 ms   banded 51.9 ms
#   D=11,381 (120 s): dense 56.1 ms   banded 83.9 ms
#   D=17,039 (180 s): dense 112.3 ms  banded 139.9 ms
# The dense factorization gets MORE MXU-efficient with size (2.0 ->
# 14.7 achieved TFLOPS across that sweep) while the banded slab scan
# grows ~linearly but stays latency-bound; extrapolating the measured
# slopes puts the crossover near D ~ 2.5e4 (several-minute recordings /
# large multi-sequence problems). The constant is that measured
# extrapolation, not a guess — re-sweep when the solve path changes.
BANDED_MIN_DIM = 25000


def make_solve_fn(p: SplineProblem, layout, solver: str = "auto"):
    """Damped-solve callable for lm.lm_optimize.

    "banded" (or "auto" at large D): block-tridiagonal-over-slabs +
    arrowhead Schur solve (solver/banded.py) when the problem's
    measurement windows admit a slab decomposition — the structured
    replacement for Ceres SPARSE_NORMAL_CHOLESKY (impl.h:258). Returns
    None (lm's dense damped Cholesky) when dense is faster
    (D < BANDED_MIN_DIM under "auto"), no decomposition exists, or
    solver="dense".
    """
    if solver == "auto" and layout.tangent_dim < BANDED_MIN_DIM:
        return None
    if solver in ("auto", "banded"):
        from openimucameracalibrator_tpu.solver import banded as banded_mod

        struct = banded_mod.from_problem(layout, p, ORDER)
        if struct is not None:
            return banded_mod.make_banded_solver(struct)
        if solver == "banded":
            raise ValueError("problem admits no slab decomposition; use "
                             "solver='auto' or 'dense'")
    return None


def optimize(p: SplineProblem, params0: dict, flags: frozenset = DEFAULT_FLAGS,
             max_iters: int = 50, config: lm.LMConfig | None = None,
             reproj_chunk: int | None = None, method: str = "fast",
             solver: str = "auto", strategy: str = "classic") -> lm.LMResult:
    """Run LM on the full problem with the given free-parameter flags
    (SplineTrajectoryEstimator::Optimize, impl.h:254-276).

    method "fast" uses chunk-local dense assembly; "scatter" the direct
    block scatter-add (reference implementation for equivalence tests).
    """
    cfg = config or lm.LMConfig(max_iters=max_iters, ftol=1e-4)  # ftol impl.h:267
    return optimize_stages(p, params0, [(flags, cfg.max_iters)], config=cfg,
                           method=method, reproj_chunk=reproj_chunk,
                           solver=solver, strategy=strategy)[-1]


def optimize_stages(p: SplineProblem, params0: dict, stages,
                    config: lm.LMConfig | None = None, method: str = "fast",
                    reproj_chunk: int | None = None,
                    checkpoint_dir: str | None = None,
                    solver: str = "auto", strategy: str = "classic") -> list:
    """Run a SCHEDULE of LM stages with ONE compiled solver.

    ``stages``: list of (flags, max_iters). The free-parameter mask and the
    iteration cap are traced arguments of a single jitted LM, so multi-stage
    schedules (e.g. full batch then +CAM_LINE_DELAY, the reference's
    continuous_time...cc:215-221) compile exactly once. Returns the list of
    LMResult, one per stage; each stage starts from the previous solution.

    ``checkpoint_dir``: solver-state checkpointing (SURVEY.md §5). Each
    completed stage snapshots its parameter pytree; on rerun, completed
    stages are skipped and their solutions restored with their true
    convergence status. Checkpoints carry a fingerprint of the problem
    inputs + stage schedule + parameter tree signature; any mismatch
    (re-detected corners, changed flags, different shapes) invalidates
    them instead of restoring a stale solution.
    """
    from openimucameracalibrator_tpu.utils import checkpoint as ckpt

    layout = build_layout(p)
    if method == "fast":
        lin, cost = make_solver_functions_fast(p, layout)
    else:
        lin, cost = make_solver_functions(p, layout, reproj_chunk=reproj_chunk)
    solve_fn = make_solve_fn(p, layout, solver)
    base_cfg = config or lm.LMConfig(ftol=1e-4)

    if checkpoint_dir:
        # Problem digest: every measurement array + static config of the
        # SplineProblem, the full stage schedule, the params0 signature,
        # AND the solver settings (LMConfig + solver choice) — rerunning
        # with changed ftol/damping/solver must invalidate, not restore.
        prob_fp = ckpt.fingerprint(
            {k: (np.asarray(v) if v is not None and not isinstance(
                v, (int, float, bool, str)) else v)
             for k, v in p._asdict().items()},
            [(sorted(f), int(n)) for f, n in stages],
            ckpt.tree_signature(jax.device_get(params0)),
            str(np.asarray(next(iter(params0.values())).dtype)),
            sorted(base_cfg._asdict().items()), str(solver), str(strategy))
    else:
        prob_fp = None

    @jax.jit
    def run(prm, mask, iters):
        cfg = base_cfg._replace(max_iters=iters)
        return lm.lm_optimize(lin, cost, layout.retract, prm, mask, cfg,
                              solve_fn=solve_fn, strategy=strategy)

    results = []
    params = params0
    for i, (flags, iters) in enumerate(stages):
        restored = (ckpt.load_stage(checkpoint_dir, i, fingerprint=prob_fp)
                    if checkpoint_dir else None)
        if restored is not None:
            saved, meta = restored
            params = {k: jnp.asarray(v, next(iter(params0.values())).dtype)
                      for k, v in saved.items()}
            status = int(meta.get("status", lm.STATUS_CONVERGED))
            results.append(lm.LMResult(
                params=params,
                cost=jnp.asarray(meta.get("cost", np.nan)),
                iterations=jnp.asarray(int(meta.get("iterations", 0))),
                lam=jnp.asarray(meta.get("lam", 0.0)),
                converged=jnp.asarray(bool(meta.get(
                    "converged", status == lm.STATUS_CONVERGED))),
                status=jnp.asarray(status),
                cost_history=jnp.zeros((base_cfg.history_len,))))
            continue
        mask = layout.free_mask(fixed=flags_to_fixed(frozenset(flags)))
        res = run(params, mask, jnp.asarray(iters, jnp.int32))
        params = res.params
        results.append(res)
        if checkpoint_dir:
            ckpt.save_stage(checkpoint_dir, i, jax.device_get(params),
                            cost=res.cost, lam=res.lam,
                            iterations=res.iterations,
                            converged=res.converged, status=res.status,
                            fingerprint=prob_fp)
    return results


# ---------------------------------------------------------------------------
# Evaluation helpers (GetPose / GetAngularVelocity / ... impl.h:898-991)
# ---------------------------------------------------------------------------

def evaluate_pose(p: SplineProblem, params, t):
    qs = spline.so3_eval_batch(params["q_so3"], t, p.t0, p.dt_so3, ORDER)
    ts = spline.r3_eval_batch(params["t_r3"], t, p.t0, p.dt_r3, 0, ORDER)
    return qs, ts


def evaluate_imu_components(p: SplineProblem, params, t):
    """(accel_spline, gyro_spline, accel_bias, gyro_bias) at times t.

    The spline terms exclude the bias — the split the reference's result
    dump uses (GetAcceleration/GetAngularVelocity impl.h:898-991 next to
    GetAcclBias/GetGyroBias impl.h:1180-1234, written to the result json
    at continuous_time_imu_to_camera_calibration.cc:273-332)."""
    qs, omega = spline.so3_vel_batch(params["q_so3"], t, p.t0, p.dt_so3, ORDER)
    a_w = spline.r3_eval_batch(params["t_r3"], t, p.t0, p.dt_r3, 2, ORDER)
    i_b, u_b = spline.spline_coords(t, p.t0, p.dt_bias, p.n_bias, BIAS_ORDER)
    ba = jax.vmap(lambda w, u: spline.r3_eval(w, u, p.dt_bias, 0, BIAS_ORDER))(
        spline.gather_window(params["bias_a"], i_b, BIAS_ORDER), u_b)
    bg = jax.vmap(lambda w, u: spline.r3_eval(w, u, p.dt_bias, 0, BIAS_ORDER))(
        spline.gather_window(params["bias_g"], i_b, BIAS_ORDER), u_b)
    acc_spline = lie.quat_rotate(lie.quat_conjugate(qs), a_w + params["gravity"])
    return acc_spline, omega, ba, bg


def evaluate_imu(p: SplineProblem, params, t):
    """Predicted (accel_reading, gyro_reading) at times t."""
    acc_spline, omega, ba, bg = evaluate_imu_components(p, params, t)
    return acc_spline + ba, omega + bg


def mean_reprojection_error(p: SplineProblem, params) -> float:
    """Mean pixel reprojection error over valid observations
    (GetMeanReprojectionError, impl.h:993-1072). Reported in raw pixels:
    feature-covariance whitening is disabled for this metric."""
    p = p._replace(obs_sqrt_info=None)
    layout = build_layout(p)
    rp, _, _ = _reproj_r_and_idx(params, p, layout, with_jac=False)
    w = (p.obs_valid & _in_range(p, p.obs_t)).astype(rp.dtype)
    err = jnp.linalg.norm(rp, axis=-1) * w
    return float(jnp.sum(err) / jnp.maximum(jnp.sum(w), 1.0))


def per_view_reprojection_rmse(p: SplineProblem, params,
                               points_per_view: int) -> np.ndarray:
    """(V,) per-view RMSE in pixels, NaN for views with no valid
    observation (the reference prints per-view errors via
    GetReprojErrorOfView, src/utils/utils.cc:163-177). Observations are
    view-major (build_problem tiles board points per view). Raw pixels:
    whitening disabled for this metric."""
    p = p._replace(obs_sqrt_info=None)
    rp, _, _ = _reproj_eval(params, p, with_jac=False)
    w = (p.obs_valid & _in_range(p, p.obs_t)).astype(rp.dtype)
    se_px = jnp.sum(rp * rp, axis=-1) * w
    V = p.obs_t.shape[0] // points_per_view
    se_v = se_px[:V * points_per_view].reshape(V, points_per_view).sum(1)
    n_v = w[:V * points_per_view].reshape(V, points_per_view).sum(1)
    rmse = jnp.sqrt(se_v / jnp.maximum(n_v, 1.0))
    return np.asarray(jnp.where(n_v > 0, rmse, jnp.nan))
