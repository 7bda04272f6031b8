"""Synthetic calibration scenes: analytic trajectories, corners, IMU readings.

The reference has no automated tests (SURVEY.md §4); its quality bar is a
hand-checked table of numbers. This module is the foundation of our test
pyramid instead: an analytic, infinitely differentiable ground-truth
trajectory from which we render perfect (or noise-perturbed) board corners
and IMU measurements, so every estimator can be validated by exact
parameter recovery.

Angular velocity and linear acceleration are obtained from the analytic
pose by nested ``jax.jvp`` — no finite differences anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.models import boards as boards_mod
from openimucameracalibrator_tpu.models.cameras import CameraModel
from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.utils import precision

GRAVITY = 9.81


def sinusoid_trajectory(key: jax.Array, duration: float,
                        pos_center=(0.2, 0.15, 0.75), pos_amp=0.25,
                        rot_amp=0.35, n_harmonics: int = 3,
                        base_freq: float = 0.4, q_base=None):
    """Random smooth SE(3) trajectory t -> (q_w_b, p_w) facing a board at z=0.

    By default the body starts looking down the -z world axis toward the
    board plane (board at z=0, camera at z ~ +0.75 looking back), with
    bounded sinusoid translation and rotation-vector wobble. Pass an
    explicit ``q_base`` to change the facing — e.g. identity with a
    negative-z ``pos_center`` for the OpenCV board convention (board x
    right / y down / z away from the viewer, camera on the -z side looking
    along +z), which is what full-frame rendering of a printed target
    needs (utils/recorded.py). Returns a scalar-time callable.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    freqs = base_freq * (1.0 + jnp.arange(n_harmonics, dtype=precision.default_dtype()))
    amp_p = pos_amp * jax.random.uniform(k1, (n_harmonics, 3), precision.default_dtype(), -1.0, 1.0) / (1.0 + jnp.arange(n_harmonics, dtype=precision.default_dtype()))[:, None]
    phase_p = jax.random.uniform(k2, (n_harmonics, 3), precision.default_dtype(), 0.0, 2 * np.pi)
    amp_r = rot_amp * jax.random.uniform(k3, (n_harmonics, 3), precision.default_dtype(), -1.0, 1.0) / (1.0 + jnp.arange(n_harmonics, dtype=precision.default_dtype()))[:, None]
    phase_r = jax.random.uniform(k4, (n_harmonics, 3), precision.default_dtype(), 0.0, 2 * np.pi)
    center = jnp.asarray(pos_center, precision.default_dtype())
    if q_base is None:
        # Base orientation: camera/body z-axis pointing toward the board
        # (world -z direction): rotate pi about the x axis.
        q_base = lie.so3_exp(jnp.array([np.pi, 0.0, 0.0], dtype=precision.default_dtype()))
    q_base = jnp.asarray(q_base, precision.default_dtype())

    def pose(t):
        t = jnp.asarray(t, precision.default_dtype())
        ph = 2 * np.pi * freqs * t
        p = center + jnp.sum(amp_p * jnp.sin(ph[:, None] + phase_p), axis=0)
        r = jnp.sum(amp_r * jnp.sin(ph[:, None] + phase_r), axis=0)
        q = lie.quat_multiply(lie.so3_exp(r), q_base)
        return q, p

    return pose


def pose_derivatives(pose_fn: Callable, t):
    """(q, p, omega_body, vel_w, acc_w) at scalar time t via nested jvp."""
    def qp(tt):
        return pose_fn(tt)

    (q, p), (dq, dp) = jax.jvp(qp, (t,), (jnp.ones_like(t),))
    omega = 2.0 * lie.quat_multiply(lie.quat_conjugate(q), dq)[..., 1:4]

    def vel(tt):
        _, (dq_, dp_) = jax.jvp(qp, (tt,), (jnp.ones_like(tt),))
        return dp_

    acc = jax.jvp(vel, (t,), (jnp.ones_like(t),))[1]
    return q, p, omega, dp, acc


@dataclasses.dataclass
class SyntheticScene:
    """Everything a calibration test needs, from one ground truth."""

    board: boards_mod.Board
    cam_params: jnp.ndarray
    model: CameraModel
    image_size: tuple
    # Camera views
    frame_times: np.ndarray  # (V,)
    q_w_c: np.ndarray  # (V, 4) camera-to-world rotation
    t_w_c: np.ndarray  # (V, 3)
    observations: np.ndarray  # (V, P, 2) pixel corners
    obs_valid: np.ndarray  # (V, P) in-image mask
    # IMU (only for imu-camera scenes)
    imu_times: np.ndarray | None = None
    accel: np.ndarray | None = None
    gyro: np.ndarray | None = None
    q_i_c: np.ndarray | None = None  # extrinsics: camera-to-IMU
    t_i_c: np.ndarray | None = None
    time_offset: float = 0.0
    line_delay: float = 0.0
    gravity_w: np.ndarray | None = None
    pose_fn: Callable | None = None


def render_view(model: CameraModel, cam_params, board_pts, q_w_c, t_w_c, image_size):
    """Project board points into one view. Returns (uv, valid)."""
    q_c_w, t_c_w = lie.se3_inverse(q_w_c, t_w_c)
    p_cam = lie.se3_act(q_c_w, t_c_w, board_pts)
    uv, ok = model.project(cam_params, p_cam)
    w, h = image_size
    inside = (uv[..., 0] >= 0) & (uv[..., 0] < w) & (uv[..., 1] >= 0) & (uv[..., 1] < h)
    return uv, ok & inside & (p_cam[..., 2] > 0.05)


def make_intrinsics_scene(model: CameraModel, cam_params, *, num_views: int = 40,
                          image_size=(960, 540), noise_px: float = 0.2,
                          seed: int = 0,
                          board: boards_mod.Board | None = None) -> SyntheticScene:
    """Static board + moving camera: intrinsics-calibration test scene."""
    board = board or boards_mod.charuco_board()
    key = jax.random.PRNGKey(seed)
    pose_fn = sinusoid_trajectory(key, duration=float(num_views))
    times = np.linspace(0.0, 1.0 / 0.4 * 0.9, num_views)  # cover most of a period
    qs, ps = jax.vmap(lambda t: pose_fn(jnp.asarray(t)))(jnp.asarray(times))
    pts = jnp.asarray(board.points)
    uv, valid = jax.vmap(lambda q, p: render_view(model, cam_params, pts, q, p, image_size))(qs, ps)
    noise = jax.random.normal(jax.random.PRNGKey(seed + 1), uv.shape, precision.default_dtype()) * noise_px
    return SyntheticScene(
        board=board, cam_params=jnp.asarray(cam_params), model=model,
        image_size=image_size, frame_times=np.asarray(times),
        q_w_c=np.asarray(qs), t_w_c=np.asarray(ps),
        observations=np.asarray(uv + noise), obs_valid=np.asarray(valid),
        pose_fn=pose_fn)


def make_imu_camera_scene(model: CameraModel, cam_params, *, duration: float = 20.0,
                          cam_fps: float = 30.0, imu_rate: float = 200.0,
                          image_size=(960, 540), noise_px: float = 0.2,
                          accel_noise: float = 0.02, gyro_noise: float = 0.002,
                          accel_bias=(0.05, -0.03, 0.08), gyro_bias=(0.004, -0.002, 0.003),
                          q_i_c=None, t_i_c=(0.01, -0.02, 0.001),
                          time_offset: float = -0.05, line_delay: float = 0.0,
                          seed: int = 0,
                          board: boards_mod.Board | None = None) -> SyntheticScene:
    """Full IMU+camera scene from one analytic body (IMU) trajectory.

    The IMU clock is the reference clock. Camera frames are timestamped on
    the camera clock: t_cam = t_imu - time_offset (so shifting camera
    timestamps BY the returned offset aligns them, matching the sign
    convention of the reference's golden-section search,
    imu_to_camera_rotation_estimator.cc:220-262). If ``line_delay`` > 0,
    each observation is rendered at t + line_delay * row (rolling shutter,
    spline_trajectory_estimator.impl.h:344-346).
    """
    board = board or boards_mod.charuco_board()
    if q_i_c is None:
        # GoPro-like: camera rotated ~90 deg about z relative to IMU.
        q_i_c = np.asarray(lie.so3_exp(jnp.array([0.03, -0.02, np.pi / 2], dtype=precision.default_dtype())))
    q_i_c = jnp.asarray(q_i_c, precision.default_dtype())
    t_i_c = jnp.asarray(t_i_c, precision.default_dtype())
    g_w = jnp.array([0.0, 0.0, GRAVITY], dtype=precision.default_dtype())  # reference conv: residual uses a_w + g

    key = jax.random.PRNGKey(seed)
    pose_fn = sinusoid_trajectory(key, duration, rot_amp=0.3, pos_amp=0.18)

    # --- IMU samples (body frame = IMU frame) ---
    imu_times = np.arange(0.0, duration, 1.0 / imu_rate)
    tt = jnp.asarray(imu_times)
    q, p, omega, vel, acc = jax.vmap(lambda t: pose_derivatives(pose_fn, t))(tt)
    # accelerometer measures R^T (a_w + g) (reference residual convention,
    # ceres_calib_split_residuals.h:52-93)
    f_b = lie.quat_rotate(lie.quat_conjugate(q), acc + g_w)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 2), 3)
    accel = f_b + jnp.asarray(accel_bias) + accel_noise * jax.random.normal(k1, f_b.shape, precision.default_dtype())
    gyro = omega + jnp.asarray(gyro_bias) + gyro_noise * jax.random.normal(k2, omega.shape, precision.default_dtype())

    # --- camera frames ---
    n_frames = int(duration * cam_fps) - 2
    frame_times_imu = np.arange(n_frames) / cam_fps + 0.5 / cam_fps
    ft = jnp.asarray(frame_times_imu)
    q_wi, p_wi = jax.vmap(lambda t: pose_fn(t))(ft)
    q_wc, t_wc = jax.vmap(lambda qq, pp: lie.se3_compose(qq, pp, q_i_c, t_i_c))(q_wi, p_wi)
    pts = jnp.asarray(board.points)

    if line_delay > 0:
        def uv_one(t_q, pt):
            """Project a single board point at its own capture time."""
            qi, pi = pose_fn(t_q)
            qc, tc = lie.se3_compose(qi, pi, q_i_c, t_i_c)
            return render_view(model, cam_params, pt[None], qc, tc, image_size)

        def render_rs(t_frame):
            qi, pi = pose_fn(t_frame)
            qc, tc = lie.se3_compose(qi, pi, q_i_c, t_i_c)
            uv0, v0 = render_view(model, cam_params, pts, qc, tc, image_size)
            # Fixed-point iteration over the row-dependent capture time
            # (line_delay * image_height << frame period, converges fast).
            for _ in range(3):
                t_rows = t_frame + line_delay * uv0[:, 1]
                uv_n, v_n = jax.vmap(uv_one)(t_rows, pts)
                uv0, v0 = uv_n[:, 0, :], v_n[:, 0]
            return uv0, v0

        uv, valid = jax.vmap(render_rs)(ft)
    else:
        uv, valid = jax.vmap(lambda qq, tt_: render_view(model, cam_params, pts, qq, tt_, image_size))(q_wc, t_wc)

    noise = noise_px * jax.random.normal(k3, uv.shape, precision.default_dtype())
    return SyntheticScene(
        board=board, cam_params=jnp.asarray(cam_params), model=model,
        image_size=image_size,
        frame_times=np.asarray(frame_times_imu) - time_offset,  # camera clock
        q_w_c=np.asarray(q_wc), t_w_c=np.asarray(t_wc),
        observations=np.asarray(uv + noise), obs_valid=np.asarray(valid),
        imu_times=imu_times, accel=np.asarray(accel), gyro=np.asarray(gyro),
        q_i_c=np.asarray(q_i_c), t_i_c=np.asarray(t_i_c),
        time_offset=time_offset, line_delay=line_delay,
        gravity_w=np.asarray(g_w), pose_fn=pose_fn)
