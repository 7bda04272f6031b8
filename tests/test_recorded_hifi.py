"""High-fidelity recorded-data validation at the reference's published
resolution: 960x540, GoPro9-class intrinsics and board geometry
(BASELINE.md rows 1-3; reference Readme.md:33-51). The lower-resolution
smoke e2e lives in test_recorded_e2e.py; these runs hold the pipeline to
the PUBLISHED accuracy bars: intrinsics <= 0.31 px and final IMU-camera
reprojection <= 0.9 px.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openimucameracalibrator_tpu.apps import run_calibration  # noqa: E402
from openimucameracalibrator_tpu.utils import recorded  # noqa: E402

# Reference-published configuration: 960x540, GoPro9 Wide intrinsics,
# 10x8 charuco with 0.04 m squares (resource/board.png geometry), RS line
# delay at the reference's 1/fps/rows-class init value.
HIFI_KW = dict(duration=10.0, cam_fps=24.0, intrinsics_frames=30,
               image_size=(960, 540), time_offset=-0.0813,
               line_delay=30.895e-6,
               squares_x=10, squares_y=8, square_length=0.04,
               marker_length=0.03, supersample=4, seed=9)


@pytest.fixture(scope="module")
def hifi_summary(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("recorded_hifi"))
    rec = recorded.make_recording(outdir, **HIFI_KW)
    ws = str(tmp_path_factory.mktemp("ws_hifi"))
    args = run_calibration.build_parser().parse_args([
        "--path_calib_dataset", os.path.dirname(rec.cam_video),
        "--telemetry_json", rec.imu_cam_video,
        "--telemetry_format", "gopro",
        "--num_squares_x", "10", "--num_squares_y", "8",
        "--checker_size_m", "0.04", "--marker_size_m", "0.03",
        "--workspace", ws,  # rolling shutter on (no --global_shutter)
    ])
    return run_calibration.run(args), rec


def test_hifi_intrinsics_published_bar(hifi_summary):
    """Intrinsics at the published <=0.31 px bar (Readme.md:33: 0.31 px at
    960x540), focal within 0.5%, division coefficient recovered."""
    summary, rec = hifi_summary
    assert summary["intrinsics_reproj_error_px"] <= 0.31, \
        summary["intrinsics_reproj_error_px"]
    got = np.asarray(summary["intrinsics_params"])
    gt = rec.cam_params
    assert abs(got[0] - gt[0]) / gt[0] < 0.005, (got[0], gt[0])
    assert abs(got[1] - gt[1]) < 1.5 and abs(got[2] - gt[2]) < 1.5
    # Division-undistortion coefficient (reference: -1.4386e-6): right
    # sign and magnitude within 15%.
    assert got[3] < 0
    assert abs(got[3] - gt[3]) / abs(gt[3]) < 0.15, (got[3], gt[3])


def test_hifi_imu_camera_published_bar(hifi_summary):
    """Batch calibration at the published class: final mean reprojection
    <= 0.9 px (Readme.md:45-51 report 0.59-0.9 px), millisecond-level
    time offset, mm-level extrinsics."""
    summary, rec = hifi_summary
    assert summary["final_reproj_error_px"] <= 0.9, \
        summary["final_reproj_error_px"]
    assert abs(summary["time_offset_s"] - rec.time_offset) < 2e-3
    t_err = np.abs(np.asarray(summary["t_i_c"]) - rec.t_i_c)
    assert np.all(t_err < 5e-3), t_err
    q_got = np.asarray(summary["q_i_c"])
    ang = 2 * np.arccos(min(1.0, abs(float(np.dot(q_got, rec.q_i_c)))))
    assert ang < np.deg2rad(0.35), np.rad2deg(ang)
    # Line delay stays physical (the 30.9 us ground truth is weakly
    # observable at this motion level; the strong RS recovery test is
    # test_recorded_e2e.py::test_rolling_shutter_line_delay_from_pixels).
    assert 0.0 <= summary["line_delay_us"] <= 80.0


def test_hifi_fisheye_intrinsics(tmp_path_factory):
    """Fisheye (Kannala-Brandt) intrinsics from rendered 960x540 video —
    BASELINE.md row 3 class (published 0.24 px)."""
    from openimucameracalibrator_tpu.core import board_extractor, camera_calibrator

    outdir = str(tmp_path_factory.mktemp("recorded_fe"))
    rec = recorded.make_recording(outdir, model_name="fisheye",
                                  image_size=(960, 540),
                                  intrinsics_frames=30, squares_x=10,
                                  squares_y=8, square_length=0.04,
                                  marker_length=0.03, supersample=3,
                                  seed=12, imu_cam=False)
    opts = board_extractor.BoardExtractorOptions(
        squares_x=10, squares_y=8, square_length=0.04, marker_length=0.03)
    ds = board_extractor.extract_board_from_video(rec.cam_video, opts)
    calib, _ = camera_calibrator.calibrate_camera(ds, "fisheye")
    assert calib.mean_reproj_error <= 0.31, calib.mean_reproj_error
    got = np.asarray(calib.params)
    assert abs(got[0] - rec.cam_params[0]) / rec.cam_params[0] < 0.01
    assert abs(got[2] - rec.cam_params[2]) < 2.0
    assert abs(got[3] - rec.cam_params[3]) < 2.0
    # Distortion recovery, compared in FUNCTION space over the OBSERVED
    # field: the odd-power theta-polynomial basis (theta^3..theta^9) is
    # near-collinear over a finite FOV, so raw coefficients are
    # ill-conditioned (and unconstrained beyond the largest observed
    # angle); the projected radius curve r(theta) = f*d(theta) on the
    # covered field is what the data determines. Demand sub-pixel
    # agreement there.
    r_obs = np.linalg.norm(
        np.asarray(ds.points2d) - np.asarray([got[2], got[3]]), axis=-1)
    r_max = float(r_obs[np.asarray(ds.valid)].max())

    def d_theta(d, theta):
        return (theta + d[0] * theta ** 3 + d[1] * theta ** 5
                + d[2] * theta ** 7 + d[3] * theta ** 9)

    # Invert r_true(theta_max) = r_max with the TRUE parameters.
    grid = np.linspace(0.0, 1.4, 2000)
    r_true_grid = rec.cam_params[0] * d_theta(np.asarray(rec.cam_params[4:8]),
                                              grid)
    theta_max = grid[np.searchsorted(r_true_grid, r_max).clip(0, 1999)]
    theta = np.linspace(0.0, theta_max, 200)
    r_got = got[0] * d_theta(np.asarray(got[4:8]), theta)
    r_true = rec.cam_params[0] * d_theta(np.asarray(rec.cam_params[4:8]),
                                         theta)
    assert np.max(np.abs(r_got - r_true)) < 1.0, \
        (np.max(np.abs(r_got - r_true)), theta_max, got[4:8],
         rec.cam_params[4:8])


# --- Degraded footage: toward real-GoPro imaging conditions ---------------
# The reference's published bars are measured on REAL GoPro video
# (Readme.md:31-51); clean renders flatter the detector. This variant adds
# true motion blur (multi-tap exposure re-render), sensor noise, exposure
# flicker, and heavy MJPEG quantization, and holds the SAME published
# bars (VERDICT r4 next #8).
DEGRADED_KW = dict(HIFI_KW, seed=11, noise_std=3.0,
                   motion_blur_s=4e-3,      # ~1-2 px blur at this motion
                   exposure_flicker=0.08,   # 8% gain modulation @ 8 Hz
                   jpeg_quality=70)         # visible DCT artifacts


@pytest.fixture(scope="module")
def degraded_summary(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("recorded_degraded"))
    rec = recorded.make_recording(outdir, **DEGRADED_KW)
    ws = str(tmp_path_factory.mktemp("ws_degraded"))
    args = run_calibration.build_parser().parse_args([
        "--path_calib_dataset", os.path.dirname(rec.cam_video),
        "--telemetry_json", rec.imu_cam_video,
        "--telemetry_format", "gopro",
        "--num_squares_x", "10", "--num_squares_y", "8",
        "--checker_size_m", "0.04", "--marker_size_m", "0.03",
        "--workspace", ws,
    ])
    return run_calibration.run(args), rec


def test_degraded_intrinsics_published_bar(degraded_summary):
    summary, rec = degraded_summary
    assert summary["intrinsics_reproj_error_px"] <= 0.31, \
        summary["intrinsics_reproj_error_px"]
    got = np.asarray(summary["intrinsics_params"])
    assert abs(got[0] - rec.cam_params[0]) / rec.cam_params[0] < 0.01


def test_degraded_imu_camera_published_bar(degraded_summary):
    summary, rec = degraded_summary
    assert summary["final_reproj_error_px"] <= 0.9, \
        summary["final_reproj_error_px"]
    assert abs(summary["time_offset_s"] - rec.time_offset) < 3e-3
    q_got = np.asarray(summary["q_i_c"])
    ang = 2 * np.arccos(min(1.0, abs(float(np.dot(q_got, rec.q_i_c)))))
    assert ang < np.deg2rad(0.5), np.rad2deg(ang)


def test_degraded_native_vs_opencv_corners(degraded_summary):
    """Corner-by-corner cross-validation of the native detector against
    OpenCV's charuco detector on the SAME degraded frames."""
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "aruco"):
        pytest.skip("cv2 without aruco")
    _, rec = degraded_summary
    from openimucameracalibrator_tpu.core import board_extractor

    kw = dict(squares_x=10, squares_y=8, square_length=0.04,
              marker_length=0.03)
    frames = []
    for k, (t, g) in enumerate(
            board_extractor.iter_video_frames(rec.imu_cam_video)):
        if k % 40 == 0:
            frames.append((t, g))
        if len(frames) >= 5:
            break
    ds_nat = board_extractor.extract_board(
        iter(frames), board_extractor.BoardExtractorOptions(**kw))
    ds_cv = board_extractor.extract_board(
        iter(frames),
        board_extractor.BoardExtractorOptions(backend="opencv", **kw))
    both = ds_nat.valid & ds_cv.valid
    assert both.sum() >= 0.6 * ds_cv.valid.sum(), \
        (int(both.sum()), int(ds_cv.valid.sum()))
    d = np.linalg.norm(ds_nat.points2d[both] - ds_cv.points2d[both], axis=-1)
    # Two independent subpixel refiners on blurred+compressed imagery:
    # agreement to a fraction of a pixel.
    assert np.median(d) < 0.35, np.median(d)
    assert d.mean() < 0.6, d.mean()
