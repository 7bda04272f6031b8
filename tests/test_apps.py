"""CLI surface tests: drive the app modules the way a user would."""

import json

import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.apps import (calibrate_camera, estimate_poses,
                                              misc_tools)
from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.utils import io, synthetic
from openimucameracalibrator_tpu.utils.types import CornerDataset


def _synthetic_corner_file(tmp_path, n_views=30):
    model = cameras.get_model("pinhole")
    scene = synthetic.make_intrinsics_scene(
        model, jnp.array([437.0, 437.5, 481.0, 271.5]), num_views=n_views,
        noise_px=0.2, seed=13)
    ds = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                       valid=scene.obs_valid, board_points=np.asarray(scene.board.points),
                       image_size=scene.image_size, fps=30.0)
    path = str(tmp_path / "corners.uson")
    io.save_corners(ds, path)
    return path


def test_calibrate_camera_cli(tmp_path):
    corners = _synthetic_corner_file(tmp_path)
    out = str(tmp_path / "calib.json")
    calibrate_camera.main([
        "--input_corners", corners,
        "--save_path_calib_dataset", out,
        "--camera_model_to_calibrate", "PINHOLE",
        "--grid_size", "0.01",
    ])
    calib = io.load_camera_calibration(out)
    assert calib.model_name == "pinhole"
    assert calib.mean_reproj_error < 0.35
    np.testing.assert_allclose(calib.params[:2], [437.0, 437.5], atol=2.0)


def test_estimate_poses_cli(tmp_path):
    corners = _synthetic_corner_file(tmp_path)
    calib_path = str(tmp_path / "calib.json")
    calibrate_camera.main(["--input_corners", corners,
                           "--save_path_calib_dataset", calib_path,
                           "--camera_model_to_calibrate", "PINHOLE",
                           "--grid_size", "0.01"])
    poses_path = str(tmp_path / "poses.npz")
    estimate_poses.main(["--input_corners", corners,
                         "--camera_calibration_json", calib_path,
                         "--output_pose_dataset", poses_path])
    poses = estimate_poses.load_pose_dataset(poses_path)
    assert poses.valid.sum() >= 25


def test_sew_and_bias_cli(tmp_path, rng):
    from openimucameracalibrator_tpu.core import telemetry
    from openimucameracalibrator_tpu.utils.types import CameraTelemetry, ImuData

    t = np.arange(0, 30, 1 / 200.0)
    gyro = 0.4 * np.stack([np.sin(2 * np.pi * 1.3 * t)] * 3, -1) + rng.normal(size=(len(t), 3)) * 0.002
    accel = np.tile([0, 0, 9.81], (len(t), 1)) + rng.normal(size=(len(t), 3)) * 0.02
    tel = CameraTelemetry(imu=ImuData(times=t, accel=accel, gyro=gyro),
                          img_times=np.arange(0, 30, 1 / 30.0))
    tel_path = str(tmp_path / "telemetry.json")
    telemetry.write_generic_json(tel, tel_path, cam_fps=30.0)

    sew_path = str(tmp_path / "sew.json")
    misc_tools.sew_main(["--input_json_path", tel_path, "--output_path", sew_path])
    with open(sew_path) as f:
        sw = json.load(f)
    assert 0.01 <= sw["so3"]["knot_spacing"] <= 0.2
    assert sw["camera_fps"] > 25

    bias_path = str(tmp_path / "bias.json")
    misc_tools.biases_main(["--input_json_path", tel_path, "--output_path", bias_path])
    with open(bias_path) as f:
        b = json.load(f)
    assert abs(b["accl_bias"]["z"]) < 0.05


def test_create_board_cli(tmp_path):
    out = str(tmp_path / "board.png")
    misc_tools.board_main(["--output_path", out, "--px_per_square", "40"])
    import cv2
    img = cv2.imread(out, cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape[0] > 300
