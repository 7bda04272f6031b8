"""IMU-to-camera rotation + time-offset initialization.

TPU-native equivalent of the reference's ImuToCameraRotationEstimator
(/root/reference src/core/imu_to_camera_rotation_estimator.cc:116-274):

1. visual body-frame angular velocities from differentiated camera
   orientation quaternions (:174-200),
2. moving-average smoothing of both signals (:203-218, 15 taps),
3. golden-section search over the time offset in [-1, 1] s (:220-262),
   with an inner closed-form Kabsch/SVD alignment + gyro-bias estimate and
   Huber scoring (``SolveClosedForm`` :39-114).

The inner solve is one jitted function of (offset); the golden-section
loop runs on host (~40 cheap evaluations).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.ops import interpolation, lie
from openimucameracalibrator_tpu.utils.types import ImuCameraInit, ImuData, PoseDataset
from openimucameracalibrator_tpu.utils import precision

HUBER_K = 1.345  # imu_to_camera_rotation_estimator.cc:36-37


def visual_angular_velocity(times: jax.Array, q_w_c: jax.Array) -> jax.Array:
    """Body-frame angular velocity from consecutive orientation quats.

    Central differences: omega_k = log(q_{k-1}^{-1} q_{k+1}) / (t_{k+1} -
    t_{k-1}), assigned at t_k (a forward difference assigned at t_k — what
    a naive port of the reference's :174-200 would do — biases the time
    offset by +dt/2). Endpoints replicate their neighbors.
    """
    dq = lie.quat_multiply(lie.quat_conjugate(q_w_c[:-2]), q_w_c[2:])
    w = lie.so3_log(dq) / (times[2:] - times[:-2])[:, None]
    return jnp.concatenate([w[:1], w, w[-1:]], axis=0)


@functools.partial(jax.jit, static_argnames=())
def _alignment_cost(td, imu_times, gyro_s, vis_times, omega_vis_s, w):
    """Kabsch alignment at a candidate time offset; returns (cost, R, bias).

    Shifting camera timestamps by +td aligns them to the IMU clock:
    compare omega_vis(t) with gyro(t + td) resampled by lerp. ``w`` is a
    per-sample 0/1 weight (static shapes instead of dropping samples).
    """
    g = interpolation.interp_vector(imu_times, gyro_s, vis_times + td)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean_v = jnp.sum(omega_vis_s * w[:, None], axis=0) / n
    mean_g = jnp.sum(g * w[:, None], axis=0) / n
    A = ((omega_vis_s - mean_v) * w[:, None]).T @ (g - mean_g)
    U, _, Vt = jnp.linalg.svd(A)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.array([1.0, 1.0, 1.0]) * jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det])
    R = (U * D[None, :]) @ Vt  # omega_vis ~= R @ gyro_corrected
    bias = mean_g - R.T @ mean_v
    r = (omega_vis_s - (g - bias) @ R.T) * w[:, None]
    s = jnp.linalg.norm(r, axis=-1)
    huber = jnp.where(s <= HUBER_K, 0.5 * s * s, HUBER_K * (s - 0.5 * HUBER_K))
    return jnp.sum(huber), R, bias


@dataclasses.dataclass
class RotationEstimatorOptions:
    smooth_window: int = 15
    search_range_s: float = 1.0
    tol_s: float = 1e-4  # imu_to_camera_rotation_estimator.cc:222


def estimate_imu_to_camera_rotation(poses: PoseDataset, imu: ImuData,
                                    options: RotationEstimatorOptions | None = None
                                    ) -> ImuCameraInit:
    """Golden-section search over time offset with closed-form alignment.

    Returns R_gyro->cam (as quaternion), the time offset to ADD to camera
    timestamps, and the estimated gyro bias — matching the artifact of
    applications/estimate_imu_to_camera_rotation.cc.
    """
    opts = options or RotationEstimatorOptions()
    ok = poses.valid
    pose_t = jnp.asarray(poses.times[ok])
    q_poses = jnp.asarray(poses.q_w_c[ok])
    # Fix quaternion hemisphere continuity before slerp.
    qn = np.array(q_poses)
    for k in range(1, qn.shape[0]):
        if np.dot(qn[k], qn[k - 1]) < 0:
            qn[k] = -qn[k]
    q_poses = jnp.asarray(qn)

    # Resample the visual orientation to the IMU rate, then differentiate
    # and smooth BOTH signals with the same window at the same rate
    # (matching the reference, which interpolates visual quats to IMU rate
    # before differentiation, imu_to_camera_rotation_estimator.cc:168-218).
    imu_rate_dt = float(np.median(np.diff(imu.times)))
    vis_t = jnp.asarray(np.arange(float(pose_t[0]), float(pose_t[-1]), imu_rate_dt))
    q = interpolation.interp_quaternion(pose_t, q_poses, vis_t)
    omega_vis = visual_angular_velocity(vis_t, q)
    omega_vis_s = interpolation.moving_average(omega_vis, opts.smooth_window)
    gyro_s = interpolation.moving_average(jnp.asarray(imu.gyro), opts.smooth_window)
    imu_t = jnp.asarray(imu.times)

    # Keep only visual samples whose shifted time stays inside the IMU
    # record for every probed offset (clamp handled by interp; restrict
    # range for correctness at the boundaries).
    lo, hi = -opts.search_range_s, opts.search_range_s
    keep = ((vis_t + hi <= imu_t[-1]) & (vis_t + lo >= imu_t[0])).astype(gyro_s.dtype)

    def cost(td):
        c, _, _ = _alignment_cost(jnp.asarray(td, precision.default_dtype()), imu_t, gyro_s,
                                  vis_t, omega_vis_s, keep)
        return float(c)

    # The Huber alignment cost is not unimodal over a +-1 s range (the
    # angular-velocity signals are oscillatory), so first locate the global
    # valley with a coarse grid, then refine with golden-section inside it.
    # (The reference runs golden-section directly, :220-262, and can latch
    # onto a secondary valley; the grid scan removes that failure mode.)
    grid = np.arange(lo, hi + 1e-9, 0.01)
    costs = [cost(td) for td in grid]
    k = int(np.argmin(costs))
    lo = grid[max(k - 1, 0)]
    hi = grid[min(k + 1, len(grid) - 1)]

    # Golden-section (imu_to_camera_rotation_estimator.cc:220-262).
    invphi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c_ = b - (b - a) * invphi
    d_ = a + (b - a) * invphi
    fc, fd = cost(c_), cost(d_)
    while abs(b - a) > opts.tol_s:
        if fc < fd:
            b, d_, fd = d_, c_, fc
            c_ = b - (b - a) * invphi
            fc = cost(c_)
        else:
            a, c_, fc = c_, d_, fd
            d_ = a + (b - a) * invphi
            fd = cost(d_)
    td = 0.5 * (a + b)
    _, R, bias = _alignment_cost(jnp.asarray(td, precision.default_dtype()), imu_t, gyro_s,
                                 vis_t, omega_vis_s, keep)
    # omega_vis = R_c_g omega_gyro => R maps gyro frame into camera frame.
    q_gyro_to_cam = lie.matrix_to_quat(jnp.asarray(R))
    # Alignment diagnostics on the visual grid (debug_calib plotting).
    g_at_vis = interpolation.interp_vector(imu_t, gyro_s, vis_t + td)
    imu_transformed = (np.asarray(g_at_vis) - np.asarray(bias)) @ np.asarray(R).T
    return ImuCameraInit(
        q_gyro_to_cam=np.asarray(q_gyro_to_cam),
        time_offset=float(td), gyro_bias=np.asarray(bias),
        debug_visual_ang_vel=np.asarray(omega_vis_s),
        debug_imu_ang_vel_transformed=imu_transformed)
