import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.core import imu_cam_rotation, pose_estimator
from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.utils import synthetic
from openimucameracalibrator_tpu.utils.types import (CameraCalibration, CornerDataset,
                                                     ImuData)

CAM = [437.0, 437.5, 481.0, 271.5]


def _scene_to_dataset(scene):
    return CornerDataset(
        times=scene.frame_times, points2d=scene.observations,
        valid=scene.obs_valid, board_points=np.asarray(scene.board.points),
        image_size=scene.image_size, fps=30.0)


def _calib(scene):
    return CameraCalibration("pinhole", np.asarray(scene.cam_params),
                             scene.image_size, 0.0)


def test_pose_estimator_recovers_poses():
    model = cameras.get_model("pinhole")
    scene = synthetic.make_intrinsics_scene(model, jnp.array(CAM), num_views=40,
                                            noise_px=0.2, seed=7)
    poses = pose_estimator.estimate_poses(_scene_to_dataset(scene), _calib(scene))
    assert poses.valid.sum() >= 35
    terr = np.linalg.norm(poses.t_w_c[poses.valid] - scene.t_w_c[poses.valid], axis=-1)
    assert np.percentile(terr, 90) < 0.008, np.percentile(terr, 90)
    rerr = np.linalg.norm(np.asarray(lie.quat_boxminus(
        jnp.asarray(poses.q_w_c[poses.valid]), jnp.asarray(scene.q_w_c[poses.valid]))), axis=-1)
    assert np.percentile(rerr, 90) < 0.008, np.percentile(rerr, 90)


def test_pose_estimator_flags_corrupt_views():
    model = cameras.get_model("pinhole")
    scene = synthetic.make_intrinsics_scene(model, jnp.array(CAM), num_views=30,
                                            noise_px=0.1, seed=9)
    ds = _scene_to_dataset(scene)
    # Corrupt all corners of view 5 beyond repair.
    pts = np.array(ds.points2d)
    pts[5] += np.random.default_rng(0).normal(size=pts[5].shape) * 80.0
    ds.points2d = pts
    poses = pose_estimator.estimate_poses(ds, _calib(scene))
    assert not poses.valid[5]
    assert poses.valid.sum() >= 25


def test_imu_camera_rotation_and_time_offset():
    model = cameras.get_model("pinhole")
    scene = synthetic.make_imu_camera_scene(
        model, jnp.array(CAM), duration=25.0, cam_fps=30.0,
        time_offset=-0.0813, noise_px=0.15, seed=4)
    ds = _scene_to_dataset(scene)
    poses = pose_estimator.estimate_poses(ds, _calib(scene))
    assert poses.valid.sum() > 0.8 * len(poses.times)
    imu = ImuData(times=scene.imu_times, accel=scene.accel, gyro=scene.gyro)
    init = imu_cam_rotation.estimate_imu_to_camera_rotation(poses, imu)
    # Offset convention: t_imu = t_cam + time_offset; the estimator
    # returns the value to ADD to camera timestamps.
    assert abs(init.time_offset - scene.time_offset) < 0.004, init.time_offset
    # Rotation: omega_cam = R omega_imu with R = R(q_i_c)^T.
    q_want = np.asarray(lie.quat_conjugate(jnp.asarray(scene.q_i_c)))
    err = np.linalg.norm(np.asarray(lie.quat_boxminus(
        jnp.asarray(init.q_gyro_to_cam), jnp.asarray(q_want))))
    assert err < 0.02, (init.q_gyro_to_cam, q_want)
    # Gyro bias recovered to a few mrad/s.
    np.testing.assert_allclose(init.gyro_bias, [0.004, -0.002, 0.003], atol=2e-3)
