"""POINTS parameter block + feature-covariance whitening in the spline
problem (SplineOptimFlags::POINTS, spline_trajectory_estimator.h:17-27;
whitening ceres_calib_split_residuals.h:276-277,395-396)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.core import (imu_cam_rotation,
                                              imu_camera_calibrator,
                                              pose_estimator,
                                              spline_estimator as se)
from openimucameracalibrator_tpu.models import boards, cameras
from openimucameracalibrator_tpu.utils import synthetic
from openimucameracalibrator_tpu.utils.types import (CameraCalibration,
                                                     CornerDataset, ImuData,
                                                     SplineWeightingData)

CAM = [437.0, 437.5, 481.0, 271.5]


def _warped_inputs(duration=5.0, noise_px=0.05, seed=11):
    """IMU+camera scene rendered from a non-planar board, with the NOMINAL
    flat geometry handed to the calibrator."""
    model = cameras.get_model("pinhole")
    flat = boards.charuco_board()
    warped = boards.Board(flat.board_type, flat.points.copy(), flat.ids)
    warped.points[:, 2] += 0.002 * np.sin(warped.points[:, 0] * 20)
    scene = synthetic.make_imu_camera_scene(
        model, jnp.array(CAM), duration=duration, cam_fps=20.0, imu_rate=100.0,
        time_offset=-0.05, noise_px=noise_px, seed=seed, board=warped)
    ds = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                       valid=scene.obs_valid,
                       board_points=np.asarray(flat.points),
                       image_size=scene.image_size, fps=20.0)
    calib = CameraCalibration("pinhole", np.asarray(scene.cam_params),
                              scene.image_size, 0.0, fps=20.0)
    imu = ImuData(times=scene.imu_times, accel=scene.accel, gyro=scene.gyro)
    return scene, ds, calib, imu, warped


SEW = SplineWeightingData(dt_so3=0.1, dt_r3=0.1, std_so3=0.002, std_r3=0.02,
                          cam_fps=20.0)


def test_enable_board_points_layout():
    _, ds, calib, imu, _ = _warped_inputs(duration=3.0)
    p = se.build_problem(ds, calib, imu, SEW, time_offset=-0.05,
                         rolling_shutter=False)
    P = ds.board_points.shape[0]
    pe = se.enable_board_points(p)
    assert pe.n_points == P
    assert pe.obs_pt_id.shape == p.obs_t.shape
    np.testing.assert_array_equal(np.asarray(pe.obs_pt_id[:P]), np.arange(P))
    layout = se.build_layout(pe)
    assert "points" in layout.offsets
    assert layout.tangent_dim == se.build_layout(p).tangent_dim + 3 * P
    # Without the POINTS flag the block is fixed.
    fixed = se.flags_to_fixed(se.DEFAULT_FLAGS)
    assert "points" in fixed


def test_fast_matches_scatter_with_points():
    """Chunk-local dense assembly must equal the direct scatter path with
    POINTS active and covariance whitening on."""
    _, ds, calib, imu, _ = _warped_inputs(duration=3.0)
    p = se.build_problem(ds, calib, imu, SEW, time_offset=-0.05,
                         rolling_shutter=False)
    P = ds.board_points.shape[0]
    rng = np.random.default_rng(3)
    # Random SPD per-point reprojection covariances near identity.
    A = rng.normal(0, 0.1, (P, 2, 2))
    reproj_cov = np.einsum("pij,pkj->pik", A, A) + np.eye(2)
    pt_cov = np.broadcast_to(1e-6 * np.eye(3), (P, 3, 3)).copy()
    pe = se.enable_board_points(p, point_cov=pt_cov, reproj_cov=reproj_cov)

    poses = pose_estimator.estimate_poses(ds, calib)
    params = se.init_spline_params(poses, np.array([1.0, 0, 0, 0]),
                                   np.zeros(3), pe, imu,
                                   pose_time_offset=-0.05)
    layout = se.build_layout(pe)
    lin_f, cost_f = se.make_solver_functions_fast(pe, layout)
    lin_s, cost_s = se.make_solver_functions(pe, layout)
    Hf, gf, cf = lin_f(params)
    Hs, gs, cs = lin_s(params)
    np.testing.assert_allclose(float(cf), float(cs), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Hf), np.asarray(Hs),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(cost_f(params)), float(cost_s(params)),
                               rtol=1e-9)


@pytest.mark.slow
def test_points_recover_warped_board():
    """Optimizing board points reduces reprojection error on a warped
    board and recovers the injected z-bow (parity goal of
    OptimizeBoardPoints + POINTS, pose_estimator.cc:193-224)."""
    scene, ds, calib, imu, warped = _warped_inputs()
    poses = pose_estimator.estimate_poses(ds, calib)
    init = imu_cam_rotation.estimate_imu_to_camera_rotation(poses, imu)

    base = imu_camera_calibrator.calibrate_imu_camera(
        ds, calib, poses, imu, init, SEW, max_iters=25)
    pts = imu_camera_calibrator.calibrate_imu_camera(
        ds, calib, poses, imu, init, SEW, max_iters=25,
        optimize_board_points=True)

    assert pts.mean_reproj_error < 0.7 * base.mean_reproj_error, (
        base.mean_reproj_error, pts.mean_reproj_error)
    z_est = np.asarray(pts.params["points"][:, 2])
    z_true = warped.points[:, 2]
    corr = np.corrcoef(z_est - z_est.mean(), z_true - z_true.mean())[0, 1]
    assert corr > 0.7, corr
