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
