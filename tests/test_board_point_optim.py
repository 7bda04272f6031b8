"""Stage-4 board-point refinement: recover a warped (imperfect) board."""

import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.core import camera_calibrator
from openimucameracalibrator_tpu.models import boards, cameras
from openimucameracalibrator_tpu.utils import synthetic
from openimucameracalibrator_tpu.utils.types import CornerDataset


def test_board_point_refinement_recovers_warp(rng):
    """Render with a slightly non-planar board; stage 4 must reduce the
    reprojection error the planar assumption leaves behind."""
    model = cameras.get_model("pinhole")
    true = jnp.array([437.0, 437.5, 481.0, 271.5])
    board = boards.charuco_board()
    warped = boards.Board(board.board_type, board.points.copy(), board.ids)
    warped.points[:, 2] += 0.002 * np.sin(warped.points[:, 0] * 20)  # 2 mm bow

    scene = synthetic.make_intrinsics_scene(model, true, num_views=40,
                                            noise_px=0.05, seed=21, board=warped)
    # Feed the calibrator the NOMINAL (flat) board geometry.
    ds = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                       valid=scene.obs_valid, board_points=np.asarray(board.points),
                       image_size=scene.image_size, fps=30.0)

    flat, _ = camera_calibrator.calibrate_camera(
        ds, "pinhole", camera_calibrator.CameraCalibratorOptions(grid_size=0.01))
    refined, det = camera_calibrator.calibrate_camera(
        ds, "pinhole", camera_calibrator.CameraCalibratorOptions(
            grid_size=0.01, optimize_board_points=True))

    assert refined.mean_reproj_error < 0.6 * flat.mean_reproj_error, (
        flat.mean_reproj_error, refined.mean_reproj_error)
    # Recovered z-profile correlates with the injected bow.
    z_est = det["board_points"][:, 2]
    z_true = warped.points[:, 2]
    corr = np.corrcoef(z_est, z_true)[0, 1]
    assert corr > 0.7, corr


def test_optimize_board_points_empirical_covariance():
    """pose_estimator.optimize_board_points: recover a warped board prior and
    report per-point covariance (ref OptimizeBoardPoints,
    src/core/pose_estimator.cc:193-224)."""
    import dataclasses

    from openimucameracalibrator_tpu.core import pose_estimator
    from openimucameracalibrator_tpu.utils.types import CameraCalibration

    model = cameras.get_model("pinhole")
    p_true = jnp.asarray([450.0, 450.0, 480.0, 270.0])
    scene = synthetic.make_intrinsics_scene(model, p_true, num_views=40,
                                            noise_px=0.3, seed=1)
    ds = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                       valid=scene.obs_valid,
                       board_points=np.asarray(scene.board.points),
                       image_size=scene.image_size, fps=10.0)
    calib = CameraCalibration("pinhole", np.asarray(p_true), scene.image_size,
                              0.0, fps=10.0)
    poses = pose_estimator.estimate_poses(ds, calib)
    assert poses.valid.sum() == 40
    rng2 = np.random.default_rng(0)
    pert = rng2.normal(0, 0.0015, poses.board_points.shape)
    poses_bad = dataclasses.replace(poses,
                                    board_points=poses.board_points + pert)
    new_poses, info = pose_estimator.optimize_board_points(ds, calib, poses_bad)
    err_before = np.linalg.norm(pert, axis=1).mean()
    err_after = np.linalg.norm(new_poses.board_points
                               - poses.board_points, axis=1).mean()
    assert err_after < 0.4 * err_before
    assert info["point_cov"].shape == (63, 3, 3)
    assert info["reproj_cov"].shape == (63, 2, 2)
    assert np.isfinite(info["std_mm"]).all()
