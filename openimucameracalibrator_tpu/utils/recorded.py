"""Recorded-data harness: render full video frames from a ground-truth
trajectory and mux them with matching GPMF telemetry into GoPro-style MP4s.

This closes the loop the reference can only close with physical hardware
(/root/reference python/run_gopro_calibration.py drives real GoPro MP4s):
the end-to-end pipeline — video decode, native corner detection on
rendered sensor imagery, GPMF telemetry extraction, all calibration
stages — runs from MP4 files alone, and every recovered parameter has a
known ground truth to assert against (tests/test_recorded_e2e.py).

Frame synthesis is inverse-mapped and rolling-shutter exact: each output
pixel row r is rendered from the camera pose at t_frame + line_delay * r,
the pixel ray is unprojected through the true camera model (distortion
included), intersected with the board plane z = 0, and the board texture
is sampled bilinearly with supersampled anti-aliasing. No homography
approximation anywhere.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.detect import aruco_dict, render
from openimucameracalibrator_tpu.models import boards as boards_mod
from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.utils import mp4_writer, synthetic
from openimucameracalibrator_tpu.utils import precision


@dataclasses.dataclass(frozen=True)
class BoardTexture:
    """Rendered target image + its pixel<->meter mapping.

    Physical board point (x, y) meters maps to texture pixel
    (margin + x / square * pps - 0.5, margin + y / square * pps - 0.5)
    (pixel-center convention; board +y is texture-down, matching
    detect/render.py and models/boards.py).
    """

    image: np.ndarray  # (Ht, Wt) uint8
    px_per_square: int
    margin_px: int
    square_length: float

    def to_tex_px(self, xy_m):
        s = self.px_per_square / self.square_length
        return self.margin_px + xy_m * s - 0.5


def charuco_texture(squares_x: int = 10, squares_y: int = 8,
                    square_length: float = 0.04, marker_length: float = 0.03,
                    px_per_square: int = 64, margin_px: int = 32,
                    dictionary=None) -> BoardTexture:
    d = dictionary or aruco_dict.aruco_original_dictionary()
    img = render.render_charuco_board(d, squares_x, squares_y, square_length,
                                      marker_length, px_per_square, margin_px)
    return BoardTexture(img, px_per_square, margin_px, square_length)


@functools.partial(jax.jit, static_argnames=("model_name", "image_size",
                                             "supersample"))
def _render_frame_jit(cam_params, q_wc_rows, t_wc_rows, texture, tex_scale,
                      tex_offset, model_name: str, image_size: tuple,
                      supersample: int, background: float = 170.0):
    """(H, W) float frame: per-row camera poses (rolling-shutter exact)."""
    model = cameras.get_model(model_name)
    W, H = image_size
    s = supersample
    u = (jnp.arange(W * s) + 0.5) / s - 0.5
    v = (jnp.arange(H * s) + 0.5) / s - 0.5
    uu, vv = jnp.meshgrid(u, v)  # (H*s, W*s)
    uv = jnp.stack([uu, vv], axis=-1)
    ray_c = model.unproject(cam_params, uv)  # (H*s, W*s, 3)
    row = jnp.clip((jnp.arange(H * s) // s), 0, q_wc_rows.shape[0] - 1)
    q_rows = q_wc_rows[row]  # (H*s, 4)
    t_rows = t_wc_rows[row]  # (H*s, 3)
    d_w = lie.quat_rotate(q_rows[:, None, :], ray_c)  # (H*s, W*s, 3)
    o_w = t_rows[:, None, :]
    tz = -o_w[..., 2] / jnp.where(jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])
    X = o_w + tz[..., None] * d_w
    hit = (tz > 0.05) & (ray_c[..., 2] > 0.05)
    px = tex_offset + X[..., 0] * tex_scale
    py = tex_offset + X[..., 1] * tex_scale
    Ht, Wt = texture.shape
    inside = (px >= 0) & (px <= Wt - 1.001) & (py >= 0) & (py <= Ht - 1.001)
    pxc = jnp.clip(px, 0.0, Wt - 1.001)
    pyc = jnp.clip(py, 0.0, Ht - 1.001)
    x0 = jnp.floor(pxc).astype(jnp.int32)
    y0 = jnp.floor(pyc).astype(jnp.int32)
    du = pxc - x0
    dv = pyc - y0
    tex = texture.astype(px.dtype)
    val = (tex[y0, x0] * (1 - du) * (1 - dv) + tex[y0, x0 + 1] * du * (1 - dv)
           + tex[y0 + 1, x0] * (1 - du) * dv + tex[y0 + 1, x0 + 1] * du * dv)
    img = jnp.where(hit & inside, val, background)
    return img.reshape(H, s, W, s).mean(axis=(1, 3))


def render_frames(pose_fn, frame_stamp_times, model_name: str, cam_params,
                  q_i_c, t_i_c, tex: BoardTexture, image_size,
                  time_offset: float = 0.0, line_delay: float = 0.0,
                  supersample: int = 2, noise_std: float = 1.5, seed: int = 0,
                  motion_blur_s: float = 0.0, blur_taps: int = 3,
                  exposure_flicker: float = 0.0,
                  flicker_hz: float = 8.0):
    """uint8 frames for container-stamped times ``frame_stamp_times``.

    Frame stamped t is exposed at IMU time t + time_offset; pixel row r of a
    rolling-shutter frame at t + time_offset + line_delay * r (the convention
    recovered by the batch solver, spline_trajectory_estimator.impl.h:344-346).

    Degradations toward real GoPro footage (the reference's published bars
    are on real video, Readme.md:31-51; VERDICT r4 next #8):

    * ``motion_blur_s`` — TRUE motion blur: the frame is the average of
      ``blur_taps`` renders across an exposure window of that many
      seconds (each tap re-evaluates the full per-row RS pose chain).
    * ``exposure_flicker`` — relative sinusoidal gain modulation at
      ``flicker_hz`` (mains flicker / auto-exposure hunting analog).
    * ``noise_std`` — additive sensor noise in DN (already default-on).
    Compression artifacts come from the MJPEG mux quality
    (make_recording ``jpeg_quality``).
    """
    W, H = image_size
    cam_params = jnp.asarray(cam_params, precision.default_dtype())
    q_i_c = jnp.asarray(q_i_c, precision.default_dtype())
    t_i_c = jnp.asarray(t_i_c, precision.default_dtype())
    tex_img = jnp.asarray(tex.image)
    tex_scale = tex.px_per_square / tex.square_length
    tex_offset = tex.margin_px - 0.5
    rng = np.random.default_rng(seed)

    def cam_pose_at(t):
        qi, pi = pose_fn(t)
        return lie.se3_compose(qi, pi, q_i_c, t_i_c)

    rows = jnp.arange(H, dtype=precision.default_dtype())
    pose_rows = jax.jit(jax.vmap(cam_pose_at))
    taps = ([0.0] if motion_blur_s <= 0 else
            [k * motion_blur_s / max(blur_taps - 1, 1)
             for k in range(blur_taps)])
    frames = []
    for t_stamp in np.asarray(frame_stamp_times, np.float64):
        acc = None
        for dt_tap in taps:
            t_rows = t_stamp + time_offset + dt_tap + line_delay * rows
            q_rows, p_rows = pose_rows(t_rows)
            img = _render_frame_jit(cam_params, q_rows, p_rows, tex_img,
                                    tex_scale, tex_offset, model_name,
                                    tuple(image_size), supersample)
            acc = img if acc is None else acc + img
        img = np.asarray(acc) / len(taps)
        if exposure_flicker > 0:
            img = img * (1.0 + exposure_flicker
                         * np.sin(2.0 * np.pi * flicker_hz * t_stamp))
        if noise_std > 0:
            img = img + rng.normal(0.0, noise_std, img.shape)
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return frames


@dataclasses.dataclass
class Recording:
    """Paths + ground truth of one synthetic recorded dataset."""

    cam_video: str
    imu_cam_video: str
    cam_params: np.ndarray
    model_name: str
    image_size: tuple
    q_i_c: np.ndarray
    t_i_c: np.ndarray
    time_offset: float
    line_delay: float
    accel_bias: np.ndarray
    gyro_bias: np.ndarray
    pose_fn: object
    cam_fps: float
    imu_rate: float


def make_recording(outdir: str, *, model_name: str = "division_undistortion",
                   cam_params=None, image_size=(640, 360),
                   duration: float = 14.0, cam_fps: float = 10.0,
                   intrinsics_frames: int = 25, imu_rate: float = 200.0,
                   time_offset: float = -0.08, line_delay: float = 0.0,
                   squares_x: int = 8, squares_y: int = 6,
                   square_length: float = 0.06, marker_length: float = 0.045,
                   accel_noise: float = 0.015, gyro_noise: float = 0.0012,
                   accel_bias=(0.05, -0.03, 0.08),
                   gyro_bias=(0.004, -0.002, 0.003),
                   supersample: int = 2, seed: int = 3,
                   imu_cam: bool = True,
                   noise_std: float = 1.5, motion_blur_s: float = 0.0,
                   exposure_flicker: float = 0.0,
                   jpeg_quality: int = 92) -> Recording:
    """Render + mux a complete two-video dataset (intrinsics video without
    telemetry; imu-cam video with ACCL/GYRO/CORI GPMF track).

    ``imu_cam=False`` renders only the intrinsics video (for
    intrinsics-only fixtures, e.g. the fisheye high-fidelity test)."""
    os.makedirs(outdir, exist_ok=True)
    W, H = image_size
    model = cameras.get_model(model_name)
    if cam_params is None:
        # GoPro9-like wide intrinsics scaled to the render resolution
        # (BASELINE.md rows 1/3), principal point near the image center.
        sc = W / 960.0
        cam_params = {
            "division_undistortion": [437.13 * sc, W / 2 + 9 * sc, H / 2 + 1 * sc,
                                      -1.4386e-06 / (sc * sc)],
            "pinhole": [437.13 * sc, 437.13 * sc, W / 2 + 9 * sc, H / 2 + 1 * sc],
            # BASELINE.md row 3 (GoPro9 fisheye / Kannala-Brandt)
            "fisheye": [435.45 * sc, 435.45 * sc, W / 2 - 0.9 * sc,
                        H / 2 + 4.5 * sc, 0.05, 0.07, -0.11, 0.05],
        }.get(model_name)
        if cam_params is None:
            raise ValueError(f"no default params for {model_name}")
    cam_params = np.asarray(cam_params, np.float64)

    q_i_c = np.asarray(lie.so3_exp(jnp.array([0.03, -0.02, np.pi / 2],
                                             dtype=precision.default_dtype())))
    t_i_c = np.asarray([0.01, -0.02, 0.001])
    tex = charuco_texture(squares_x, squares_y, square_length, marker_length)

    # Camera on the -z side looking along +z: the OpenCV board convention
    # (board x right, y down, z away from the viewer) — the rendered target
    # reads exactly as printed, no mirror (see sinusoid_trajectory q_base).
    board_ctr = (squares_x * square_length / 2, squares_y * square_length / 2)
    q_front = np.array([1.0, 0.0, 0.0, 0.0])

    # --- intrinsics video: slow sweep over a second trajectory ---
    key = jax.random.PRNGKey(seed)
    pose_cam = synthetic.sinusoid_trajectory(
        key, duration=float(intrinsics_frames),
        pos_center=(board_ctr[0], board_ctr[1], -0.46), pos_amp=0.1,
        rot_amp=0.3, base_freq=0.1, q_base=q_front)
    t_cam_frames = np.linspace(0.0, 0.9 / 0.1, intrinsics_frames)
    frames_cam = render_frames(pose_cam, t_cam_frames, model_name, cam_params,
                               np.array([1.0, 0, 0, 0]), np.zeros(3), tex,
                               image_size, supersample=supersample, seed=seed,
                               noise_std=noise_std,
                               motion_blur_s=motion_blur_s,
                               exposure_flicker=exposure_flicker)
    cam_path = os.path.join(outdir, "cam.MP4")
    fps_cam = 2.0  # slow sweep; only pose diversity matters here
    mp4_writer.write_mp4(cam_path,
                         [mp4_writer.encode_jpeg(f, quality=jpeg_quality)
                          for f in frames_cam],
                         W, H, fps_cam)

    if not imu_cam:
        return Recording(cam_video=cam_path, imu_cam_video="",
                         cam_params=cam_params, model_name=model_name,
                         image_size=tuple(image_size),
                         q_i_c=q_i_c, t_i_c=t_i_c, time_offset=time_offset,
                         line_delay=line_delay,
                         accel_bias=np.asarray(accel_bias),
                         gyro_bias=np.asarray(gyro_bias), pose_fn=None,
                         cam_fps=cam_fps, imu_rate=imu_rate)

    # --- imu-cam video: dynamic trajectory + GPMF telemetry ---
    # Body = IMU; base orientation chosen so the CAMERA (body * T_i_c)
    # faces the board front: q_wi_base = q_i_c^-1.
    q_imu_base = np.asarray(lie.quat_conjugate(jnp.asarray(q_i_c)))
    pose_imu = synthetic.sinusoid_trajectory(
        jax.random.PRNGKey(seed + 1), duration, rot_amp=0.22, pos_amp=0.08,
        pos_center=(board_ctr[0], board_ctr[1], -0.46), base_freq=0.4,
        q_base=q_imu_base)
    frame_stamps = np.arange(int(duration * cam_fps) - 1) / cam_fps
    frames_ic = render_frames(pose_imu, frame_stamps, model_name, cam_params,
                              q_i_c, t_i_c, tex, image_size,
                              time_offset=time_offset, line_delay=line_delay,
                              supersample=supersample, seed=seed + 2,
                              noise_std=noise_std,
                              motion_blur_s=motion_blur_s,
                              exposure_flicker=exposure_flicker)

    imu_times = np.arange(0.0, duration, 1.0 / imu_rate)
    tt = jnp.asarray(imu_times)
    q, p, omega, vel, acc = jax.vmap(
        lambda t: synthetic.pose_derivatives(pose_imu, t))(tt)
    g_w = jnp.array([0.0, 0.0, synthetic.GRAVITY], dtype=precision.default_dtype())
    f_b = lie.quat_rotate(lie.quat_conjugate(q), acc + g_w)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 3))
    accel = np.asarray(f_b + jnp.asarray(accel_bias)
                       + accel_noise * jax.random.normal(k1, f_b.shape, precision.default_dtype()))
    gyro = np.asarray(omega + jnp.asarray(gyro_bias)
                      + gyro_noise * jax.random.normal(k2, omega.shape, precision.default_dtype()))
    payloads, dur = mp4_writer.make_imu_payloads(
        imu_times, accel, gyro, cam_quats=np.asarray(q), cam_quat_times=imu_times)
    ic_path = os.path.join(outdir, "imu_cam.MP4")
    mp4_writer.write_mp4(ic_path,
                         [mp4_writer.encode_jpeg(f, quality=jpeg_quality)
                          for f in frames_ic],
                         W, H, cam_fps, payloads, dur)

    return Recording(cam_video=cam_path, imu_cam_video=ic_path,
                     cam_params=cam_params, model_name=model_name,
                     image_size=tuple(image_size), q_i_c=q_i_c, t_i_c=t_i_c,
                     time_offset=time_offset, line_delay=line_delay,
                     accel_bias=np.asarray(accel_bias),
                     gyro_bias=np.asarray(gyro_bias), pose_fn=pose_imu,
                     cam_fps=cam_fps, imu_rate=imu_rate)
