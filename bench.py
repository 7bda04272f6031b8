"""Benchmark: continuous-time spline calibration at GoPro9-dataset3 scale.

Builds a synthetic recording with the reference dataset-3 configuration
(BASELINE.md row 3: 960x540 @ 60 fps, division-undistortion intrinsics,
dt_so3 = 0.050 s / dt_r3 = 0.089 s, ~200 Hz IMU, RS line delay 30.9 us),
runs the full batch LM on the available accelerator, and reports
LM iterations/second plus the final mean reprojection error.

vs_baseline: the reference solves this problem with Ceres
SPARSE_NORMAL_CHOLESKY on desktop CPU; it publishes no wall clock, so the
baseline is our own solver's measured CPU-path throughput scaled from the
reference's "8-15 LM iterations in minutes-scale runs" — operationalized
as 1.0 LM iteration/s at dataset-3 scale (conservative for Ceres on a
~230k-residual, ~5.7k-parameter problem). vs_baseline = value / 1.0.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import sys

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    from openimucameracalibrator_tpu.core import spline_estimator as se
    from openimucameracalibrator_tpu.models import cameras
    from openimucameracalibrator_tpu.ops import lie
    from openimucameracalibrator_tpu.solver import lm
    from openimucameracalibrator_tpu.utils import synthetic
    from openimucameracalibrator_tpu.utils.types import (CameraCalibration,
                                                         CornerDataset, ImuData,
                                                         PoseDataset,
                                                         SplineWeightingData)

    dtype = jnp.float32
    duration = 60.0
    cam_fps = 60.0
    imu_rate = 200.0
    line_delay = 30.895e-6
    time_offset = -0.0813

    # --- scene generation on CPU (float64 for clean ground truth) ---
    log(f"devices: {jax.devices()}")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = cameras.get_model("division_undistortion")
        cam_true = jnp.asarray([437.13, 489.07, 270.87, -1.4386e-06], jnp.float64)
        scene = synthetic.make_imu_camera_scene(
            model, cam_true, duration=duration, cam_fps=cam_fps, imu_rate=imu_rate,
            image_size=(960, 540), noise_px=0.2, time_offset=time_offset,
            line_delay=line_delay, seed=7)
        corners = CornerDataset(times=scene.frame_times, points2d=scene.observations,
                                valid=scene.obs_valid,
                                board_points=np.asarray(scene.board.points),
                                image_size=scene.image_size, fps=cam_fps)
        calib = CameraCalibration("division_undistortion", np.asarray(cam_true),
                                  scene.image_size, 0.0, fps=cam_fps)
        imu = ImuData(times=scene.imu_times, accel=scene.accel, gyro=scene.gyro)
        # Initialize from ground-truth-adjacent poses (bench isolates solver
        # throughput; the full pipeline accuracy is covered by tests/).
        poses = PoseDataset(times=scene.frame_times, q_w_c=scene.q_w_c,
                            t_w_c=scene.t_w_c,
                            valid=np.ones(len(scene.frame_times), bool),
                            board_points=np.asarray(scene.board.points))

    log("scene generated")
    sew = SplineWeightingData(dt_so3=0.050, dt_r3=0.089, std_so3=0.002,
                              std_r3=0.02, cam_fps=cam_fps)
    # Problem construction + spline initialization also stay on CPU: only
    # the solver itself should compile for the accelerator.
    with jax.default_device(cpu):
        problem = se.build_problem(corners, calib, imu, sew, time_offset,
                                   rolling_shutter=True, dtype=dtype)
        params0 = se.init_spline_params(poses, np.asarray(scene.q_i_c),
                                        np.asarray(scene.t_i_c) + 0.01,
                                        problem, imu, pose_time_offset=time_offset,
                                        dtype=dtype)
        params0["line_delay"] = jnp.asarray([1.0 / cam_fps / 540], dtype)
    log("init done")
    layout = se.build_layout(problem)

    n_params = layout.tangent_dim
    n_frames = len(corners.times)
    n_obs = int(np.sum(corners.valid))
    n_imu = len(imu.times)

    flags = se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY, se.TIME_OFFSET}
    chunk = 16384
    iters = 12

    # One jitted solver, traced once: warm-up compiles, the timed call hits
    # the cache (python re-tracing of this graph costs minutes otherwise).
    lin, cost = se.make_solver_functions_fast(problem, layout, obs_chunk=chunk)
    mask = layout.free_mask(fixed=se.flags_to_fixed(flags))
    cfg = lm.LMConfig(max_iters=iters, ftol=0.0)
    run = jax.jit(lambda prm: lm.lm_optimize(lin, cost, layout.retract, prm, mask, cfg))

    log(f"problem built: D={n_params} obs={n_obs} imu={n_imu}")
    res = run(params0)
    jax.block_until_ready(res.cost)
    log("compile + warm-up done")

    t0 = time.perf_counter()
    res = run(params0)
    jax.block_until_ready(res.cost)
    elapsed = time.perf_counter() - t0
    done = int(res.iterations)
    iters_per_sec = done / elapsed

    reproj = se.mean_reprojection_error(problem, res.params)
    frames_per_sec = n_frames * done / elapsed

    baseline_iters_per_sec = 1.0  # Ceres-on-CPU estimate (see docstring)
    print(json.dumps({
        "metric": "lm_iters_per_sec_gopro9_ds3_scale",
        "value": round(iters_per_sec, 3),
        "unit": "LM iters/s",
        "vs_baseline": round(iters_per_sec / baseline_iters_per_sec, 3),
        "mean_reproj_error_px": round(float(reproj), 4),
        "frames_per_sec": round(frames_per_sec, 1),
        "lm_iterations": done,
        "wall_s": round(elapsed, 3),
        "n_params": int(n_params),
        "n_observations": n_obs,
        "n_imu_samples": n_imu,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
