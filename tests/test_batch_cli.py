"""End-to-end multi-recording CLI (apps/batch_calibration.py): two
rendered MP4 recordings of the SAME rig -> one joint batched solve with
shared T_imu_cam. No reference analog (OpenICC reruns its pipeline per
recording)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openimucameracalibrator_tpu.apps import batch_calibration  # noqa: E402
from openimucameracalibrator_tpu.core import board_extractor, camera_calibrator  # noqa: E402
from openimucameracalibrator_tpu.utils import io, recorded  # noqa: E402

KW = dict(duration=6.0, cam_fps=10.0, image_size=(640, 360),
          intrinsics_frames=25, time_offset=-0.08, supersample=2,
          squares_x=8, squares_y=6, square_length=0.06,
          marker_length=0.045)


def test_batch_cli_joint_two_recordings(tmp_path):
    rec1 = recorded.make_recording(str(tmp_path / "r1"), seed=3, **KW)
    rec2 = recorded.make_recording(str(tmp_path / "r2"), seed=11, **KW)

    # Intrinsics once from recording 1's cam video (the multi-recording
    # workflow: one camera calibration, many imu-cam captures).
    opts = board_extractor.BoardExtractorOptions(
        squares_x=8, squares_y=6, square_length=0.06, marker_length=0.045)
    ds = board_extractor.extract_board_from_video(rec1.cam_video, opts)
    calib, _ = camera_calibrator.calibrate_camera(ds, "division_undistortion")
    calib_path = str(tmp_path / "cam_calib.json")
    io.save_camera_calibration(calib, calib_path)

    out_path = str(tmp_path / "rig.json")
    args = batch_calibration.build_parser().parse_args([
        "--recording", rec1.imu_cam_video,
        "--recording", rec2.imu_cam_video,
        "--camera_calibration_json", calib_path,
        "--telemetry_format", "gopro",
        "--num_squares_x", "8", "--num_squares_y", "6",
        "--checker_size_m", "0.06", "--marker_size_m", "0.045",
        "--global_shutter",
        "--max_iters", "25",
        "--output_json", out_path,
    ])
    out = batch_calibration.run(args)
    assert os.path.exists(out_path)
    assert out["n_sequences"] == 2 and out["mode"] == "joint"

    # Shared rig recovered across the two captures.
    q_got = np.asarray(out["q_i_c"])
    q_true = np.asarray(rec1.q_i_c)
    ang = 2 * np.arccos(min(1.0, abs(float(np.dot(q_got, q_true)))))
    assert ang < np.deg2rad(1.0), np.rad2deg(ang)
    np.testing.assert_allclose(out["t_i_c"], rec1.t_i_c, atol=0.02)
    for seq in out["sequences"]:
        assert seq["mean_reproj_error_px"] < 2.0, seq
        assert abs(seq["time_offset_s"] - rec1.time_offset) < 5e-3
