"""Multi-sequence batched calibration: equality vs single-sequence solves,
joint-mode shared-parameter recovery (core/batch_estimator.py; BASELINE
configs[4] — the reference has no multi-sequence mode at all, it reruns
its per-dataset pipeline per recording, python/run_gopro_calibration.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.core import batch_estimator as be
from openimucameracalibrator_tpu.core import spline_estimator as se
from openimucameracalibrator_tpu.models import cameras
from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.solver import lm
from openimucameracalibrator_tpu.utils import synthetic
from openimucameracalibrator_tpu.utils.types import (CameraCalibration,
                                                     CornerDataset, ImuData,
                                                     PoseDataset,
                                                     SplineWeightingData)

CAM = [437.0, 437.5, 481.0, 271.5]


def _sequence(duration, seed, dtype=jnp.float32, time_offset=-0.05):
    """One synthetic recording -> (problem, params0, scene)."""
    model = cameras.get_model("pinhole")
    scene = synthetic.make_imu_camera_scene(
        model, jnp.array(CAM), duration=duration, cam_fps=20.0, imu_rate=100.0,
        time_offset=time_offset, noise_px=0.15, seed=seed)
    ds = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                       valid=scene.obs_valid,
                       board_points=np.asarray(scene.board.points),
                       image_size=scene.image_size, fps=20.0)
    calib = CameraCalibration("pinhole", np.asarray(scene.cam_params),
                              scene.image_size, 0.0, fps=20.0)
    imu = ImuData(times=scene.imu_times, accel=scene.accel, gyro=scene.gyro)
    sew = SplineWeightingData(dt_so3=0.1, dt_r3=0.1, std_so3=0.002,
                              std_r3=0.02, cam_fps=20.0)
    p = se.build_problem(ds, calib, imu, sew, time_offset,
                         rolling_shutter=False, dtype=dtype)
    poses = PoseDataset(times=scene.frame_times, q_w_c=scene.q_w_c,
                        t_w_c=scene.t_w_c,
                        valid=np.ones(len(scene.frame_times), bool),
                        board_points=np.asarray(scene.board.points))
    params0 = se.init_spline_params(
        poses, np.asarray(scene.q_i_c) + 0.005,
        np.asarray(scene.t_i_c) + 0.004, p, imu,
        pose_time_offset=time_offset, dtype=dtype)
    return p, params0, scene


@pytest.fixture(scope="module")
def equality_sequences():
    # Different durations on purpose: exercises knot/measurement padding.
    # Kept short and at TWO sequences: the equality tests need padding
    # coverage, not convergence headroom, and every extra distinct shape
    # is another multi-minute XLA compile on the 2-core CI box.
    return [_sequence(3.0, seed=3), _sequence(4.5, seed=4)]


def test_independent_matches_single_solves(equality_sequences):
    seqs = equality_sequences
    cfg = lm.LMConfig(max_iters=8, ftol=0.0)
    flags = se.DEFAULT_FLAGS
    res_b = be.optimize_batch([p for p, _, _ in seqs],
                              [prm for _, prm, _ in seqs],
                              flags=flags, config=cfg, obs_chunk=512,
                              imu_chunk=128)
    for i, (p, prm0, _) in enumerate(seqs):
        ref = se.optimize(p, prm0, flags=flags, config=cfg)
        # Same measurements, same LM schedule -> same solution; padded-dim
        # factorization reorders f32 rounding, hence tolerances.
        np.testing.assert_allclose(float(res_b.cost[i]), float(ref.cost),
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res_b.params[i]["q_i_c"]),
                                   np.asarray(ref.params["q_i_c"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_b.params[i]["t_i_c"]),
                                   np.asarray(ref.params["t_i_c"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_b.params[i]["t_r3"]),
                                   np.asarray(ref.params["t_r3"]), atol=2e-3)
        assert int(res_b.iterations[i]) == int(ref.iterations)


def test_joint_single_sequence_matches_plain(equality_sequences):
    p, prm0, _ = equality_sequences[0]
    cfg = lm.LMConfig(max_iters=6, ftol=0.0)
    res_j = be.optimize_batch([p], [prm0], config=cfg, mode="joint",
                              obs_chunk=512, imu_chunk=128)
    ref = se.optimize(p, prm0, config=cfg)
    # N=1 arrowhead Schur solve == full damped solve (up to f32 rounding).
    np.testing.assert_allclose(float(res_j.cost), float(ref.cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_j.params[0]["q_i_c"]),
                               np.asarray(ref.params["q_i_c"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_j.params[0]["t_i_c"]),
                               np.asarray(ref.params["t_i_c"]), atol=2e-4)


@pytest.mark.slow
def test_joint_shares_rig_parameters():
    # Longer recordings than the equality fixture: shared-parameter
    # RECOVERY needs observability, not just padding coverage.
    seqs = [_sequence(4.0, seed=3), _sequence(5.5, seed=4),
            _sequence(4.5, seed=5)]
    cfg = lm.LMConfig(max_iters=20, ftol=0.0)
    res = be.optimize_batch([p for p, _, _ in seqs],
                            [prm for _, prm, _ in seqs],
                            config=cfg, mode="joint", obs_chunk=512,
                            imu_chunk=128)
    # Invariant: shared blocks identical across sequences.
    for name in be.DEFAULT_SHARED:
        for i in range(1, len(seqs)):
            np.testing.assert_array_equal(np.asarray(res.params[i][name]),
                                          np.asarray(res.params[0][name]))
    # The shared T_i_c is recovered against ground truth (all scenes share
    # the same rig by construction). At these short fixture durations a
    # SINGLE sequence leaves T_i_c weakly observable (independent solves
    # land 0.01-0.1 rad off); fusing three recordings through the shared
    # block must land well inside that spread.
    scene = seqs[0][2]
    rot_err = np.linalg.norm(np.asarray(lie.quat_boxminus(
        jnp.asarray(res.params[0]["q_i_c"], jnp.float64),
        jnp.asarray(np.asarray(scene.q_i_c), jnp.float64))))
    assert rot_err < 0.02, rot_err
    # Independent solves on these fixtures land 0.08-0.2 m off in t_i_c
    # (translation needs angular acceleration to be observable); the
    # 3-sequence joint solve must fuse to well inside that spread.
    np.testing.assert_allclose(np.asarray(res.params[0]["t_i_c"]),
                               np.asarray(scene.t_i_c), atol=0.04)


def test_batch_rejects_mismatched_statics(equality_sequences):
    p, prm0, _ = equality_sequences[0]
    p2 = p._replace(dt_so3=p.dt_so3 * 2)
    with pytest.raises(ValueError, match="dt_so3"):
        be.build_sequence_batch([p, p2])
