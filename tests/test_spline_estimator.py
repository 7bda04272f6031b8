"""Integration tests: continuous-time spline calibration on synthetic scenes.

The strongest test in the suite: render a full IMU+camera recording from an
analytic ground-truth trajectory, run the entire pipeline (poses -> gyro
alignment -> spline batch optimization), and assert the calibration
parameters are recovered (the reference validates the same quantities by
hand against Readme tables, SURVEY.md §4/§6).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.core import (imu_cam_rotation, imu_camera_calibrator,
                                              pose_estimator, spline_estimator as se)
from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.utils import synthetic
from openimucameracalibrator_tpu.utils.types import (CameraCalibration, CornerDataset,
                                                     ImuCameraInit, ImuData,
                                                     SplineWeightingData)

CAM = [437.0, 437.5, 481.0, 271.5]
ACCEL_BIAS = (0.05, -0.03, 0.08)
GYRO_BIAS = (0.004, -0.002, 0.003)


def _make_pipeline_inputs(duration=8.0, cam_fps=20.0, imu_rate=100.0,
                          time_offset=-0.05, line_delay=0.0, noise_px=0.15,
                          seed=2):
    model = cameras.get_model("pinhole")
    scene = synthetic.make_imu_camera_scene(
        model, jnp.array(CAM), duration=duration, cam_fps=cam_fps,
        imu_rate=imu_rate, time_offset=time_offset, line_delay=line_delay,
        noise_px=noise_px, accel_bias=ACCEL_BIAS, gyro_bias=GYRO_BIAS, seed=seed)
    ds = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                       valid=scene.obs_valid, board_points=np.asarray(scene.board.points),
                       image_size=scene.image_size, fps=cam_fps)
    calib = CameraCalibration("pinhole", np.asarray(scene.cam_params),
                              scene.image_size, 0.0, fps=cam_fps)
    imu = ImuData(times=scene.imu_times, accel=scene.accel, gyro=scene.gyro)
    return scene, ds, calib, imu


def test_full_calibration_global_shutter():
    scene, ds, calib, imu = _make_pipeline_inputs()
    poses = pose_estimator.estimate_poses(ds, calib)
    assert poses.valid.sum() > 100
    init = imu_cam_rotation.estimate_imu_to_camera_rotation(poses, imu)
    assert abs(init.time_offset - scene.time_offset) < 0.005
    sew = SplineWeightingData(dt_so3=0.1, dt_r3=0.1, std_so3=0.002, std_r3=0.02,
                              cam_fps=20.0)
    result = imu_camera_calibrator.calibrate_imu_camera(
        ds, calib, poses, imu, init, sew, max_iters=30)

    # Extrinsics: T_i_c rotation and translation.
    rot_err = np.linalg.norm(np.asarray(lie.quat_boxminus(
        jnp.asarray(result.q_i_c), jnp.asarray(scene.q_i_c))))
    assert rot_err < 0.01, (result.q_i_c, scene.q_i_c)
    np.testing.assert_allclose(result.t_i_c, scene.t_i_c, atol=0.01)
    # Gravity direction (world frame z-up, 9.81).
    np.testing.assert_allclose(result.gravity, scene.gravity_w, atol=0.15)
    # Reprojection error at the noise floor.
    assert result.mean_reproj_error < 0.35, result.mean_reproj_error
    # IMU biases recovered by the bias splines.
    acc_pred, gyro_pred = se.evaluate_imu(
        result.problem, result.params,
        jnp.asarray(imu.times[200:-200:50]))
    sel = slice(200, -200, 50)
    gyro_res = np.asarray(gyro_pred) - imu.gyro[sel]
    acc_res = np.asarray(acc_pred) - imu.accel[sel]
    assert np.abs(gyro_res).mean() < 0.01
    assert np.abs(acc_res).mean() < 0.1


@pytest.mark.slow
def test_full_calibration_rolling_shutter():
    true_ld = 30.895e-6  # reference table init (BASELINE.md)
    scene, ds, calib, imu = _make_pipeline_inputs(
        duration=8.0, line_delay=true_ld, noise_px=0.1, seed=5)
    poses = pose_estimator.estimate_poses(ds, calib)
    init = imu_cam_rotation.estimate_imu_to_camera_rotation(poses, imu)
    sew = SplineWeightingData(dt_so3=0.1, dt_r3=0.1, std_so3=0.002, std_r3=0.02,
                              cam_fps=20.0)
    result = imu_camera_calibrator.calibrate_imu_camera(
        ds, calib, poses, imu, init, sew, rolling_shutter=True, max_iters=30,
        line_delay_iters=20)
    assert result.mean_reproj_error < 0.3, result.mean_reproj_error
    # Joint refinement must beat the RS-biased golden-section init: total
    # offset within 2 ms of truth (the init alone is ~10 ms off).
    assert abs(result.time_offset - scene.time_offset) < 0.002, result.time_offset
    # Line delay recovered within ~20% despite the 3x-off 1/fps/h init.
    assert abs(result.line_delay - true_ld) < 0.3 * true_ld, result.line_delay
    rot_err = np.linalg.norm(np.asarray(lie.quat_boxminus(
        jnp.asarray(result.q_i_c), jnp.asarray(scene.q_i_c))))
    assert rot_err < 0.01


def test_spline_problem_masks_out_of_range():
    scene, ds, calib, imu = _make_pipeline_inputs(duration=6.0)
    sew = SplineWeightingData(dt_so3=0.1, dt_r3=0.1, std_so3=0.002, std_r3=0.02,
                              cam_fps=20.0)
    p = se.build_problem(ds, calib, imu, sew, time_offset=-0.05,
                         rolling_shutter=False)
    ok = np.asarray(se._in_range(p, p.accel_t))
    # IMU samples before the first (shifted) frame must be masked.
    assert not ok[0]
    assert ok.sum() > 0.8 * len(ok)


def test_solver_checkpoint_resume(tmp_path):
    """optimize_stages snapshots each stage and resumes from completed
    stages (SURVEY.md §5 checkpoint/resume; utils/checkpoint.py)."""
    import __graft_entry__ as ge
    from openimucameracalibrator_tpu.core import spline_estimator as se
    from openimucameracalibrator_tpu.solver import lm

    p, params0 = ge._tiny_problem()
    schedule = [(frozenset(se.DEFAULT_FLAGS), 3),
                (frozenset(se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY}), 2)]
    ck = str(tmp_path / "ckpt")
    cfg = lm.LMConfig(max_iters=5, ftol=0.0)
    r1 = se.optimize_stages(p, params0, schedule, config=cfg,
                            checkpoint_dir=ck)
    assert int(r1[0].iterations) > 0
    # Rerun: both stages restored with their true solver state (iteration
    # count, convergence status), same solution.
    r2 = se.optimize_stages(p, params0, schedule, config=cfg,
                            checkpoint_dir=ck)
    for a, b in zip(r1, r2):
        assert int(b.iterations) == int(a.iterations)
        assert int(b.status) == int(a.status)
        assert bool(b.converged) == bool(a.converged)
    np.testing.assert_allclose(np.asarray(r2[-1].params["t_r3"]),
                               np.asarray(r1[-1].params["t_r3"]), rtol=1e-6)
    assert np.isclose(float(r2[-1].cost), float(r1[-1].cost), rtol=1e-6)

    # Fingerprint invalidation (stale-input protection): change the inputs
    # — here a measurement value — and the checkpoints must NOT be reused.
    p_changed = p._replace(gyro_meas=p.gyro_meas + 1e-3)
    r3 = se.optimize_stages(p_changed, params0, schedule, config=cfg,
                            checkpoint_dir=ck)
    assert int(r3[0].iterations) > 0  # re-solved, not restored
    # A changed schedule invalidates too.
    r4 = se.optimize_stages(p, params0,
                            [(frozenset(se.DEFAULT_FLAGS), 2),
                             (frozenset(se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY}), 2)],
                            config=cfg, checkpoint_dir=ck)
    assert int(r4[0].iterations) > 0
