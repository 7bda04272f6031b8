"""Benchmark: continuous-time spline calibration at GoPro9-dataset3 scale.

Builds a synthetic recording with the reference dataset-3 configuration
(BASELINE.md row 3: 960x540 @ 60 fps, division-undistortion intrinsics,
dt_so3 = 0.050 s / dt_r3 = 0.089 s, ~200 Hz IMU, RS line delay 30.9 us),
runs the full batch LM on the available accelerator, and reports LM
iterations/second plus the final mean reprojection error.

vs_baseline is MEASURED, not assumed (VERDICT r1 item 2): the same
problem, same code path, is solved on the host CPU backend in float64
(the reference runs Ceres SPARSE_NORMAL_CHOLESKY in double on desktop
CPU) in a subprocess, and vs_baseline = accelerator iters/s / CPU f64
iters/s. The JSON also carries a stage breakdown (linearize / solve /
cost), a 1->8 virtual-device scaling curve for the data-parallel and
knot-sharded Schur solvers (BASELINE.md "frames/s and LM-iters/s at 1
chip, 1 host, N hosts"), and the multi-model intrinsics batch
(BASELINE.json configs[1]).

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

DURATION = 60.0
CAM_FPS = 60.0
IMU_RATE = 200.0
LINE_DELAY = 30.895e-6
TIME_OFFSET = -0.0813


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def build_ds3_problem(dtype):
    """DS3-scale synthetic problem + init params (host-side, on CPU)."""
    import jax
    import jax.numpy as jnp

    from openimucameracalibrator_tpu.core import spline_estimator as se
    from openimucameracalibrator_tpu.models import cameras
    from openimucameracalibrator_tpu.utils import synthetic
    from openimucameracalibrator_tpu.utils.types import (CameraCalibration,
                                                         CornerDataset, ImuData,
                                                         PoseDataset,
                                                         SplineWeightingData)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = cameras.get_model("division_undistortion")
        cam_true = jnp.asarray([437.13, 489.07, 270.87, -1.4386e-06])
        scene = synthetic.make_imu_camera_scene(
            model, cam_true, duration=DURATION, cam_fps=CAM_FPS,
            imu_rate=IMU_RATE, image_size=(960, 540), noise_px=0.2,
            time_offset=TIME_OFFSET, line_delay=LINE_DELAY, seed=7)
        corners = CornerDataset(times=scene.frame_times,
                                points2d=scene.observations,
                                valid=scene.obs_valid,
                                board_points=np.asarray(scene.board.points),
                                image_size=scene.image_size, fps=CAM_FPS)
        calib = CameraCalibration("division_undistortion", np.asarray(cam_true),
                                  scene.image_size, 0.0, fps=CAM_FPS)
        imu = ImuData(times=scene.imu_times, accel=scene.accel, gyro=scene.gyro)
        poses = PoseDataset(times=scene.frame_times, q_w_c=scene.q_w_c,
                            t_w_c=scene.t_w_c,
                            valid=np.ones(len(scene.frame_times), bool),
                            board_points=np.asarray(scene.board.points))
        sew = SplineWeightingData(dt_so3=0.050, dt_r3=0.089, std_so3=0.002,
                                  std_r3=0.02, cam_fps=CAM_FPS)
        problem = se.build_problem(corners, calib, imu, sew, TIME_OFFSET,
                                   rolling_shutter=True, dtype=dtype)
        params0 = se.init_spline_params(poses, np.asarray(scene.q_i_c),
                                        np.asarray(scene.t_i_c) + 0.01,
                                        problem, imu,
                                        pose_time_offset=TIME_OFFSET,
                                        dtype=dtype)
        params0["line_delay"] = jnp.asarray([1.0 / CAM_FPS / 540], dtype)
    return problem, params0, corners, imu


def _timed_lm(problem, params0, iters):
    """(iters/s, result, breakdown dict) for the fast single-device path."""
    import jax
    import jax.numpy as jnp

    from openimucameracalibrator_tpu.core import spline_estimator as se
    from openimucameracalibrator_tpu.solver import lm

    layout = se.build_layout(problem)
    flags = se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY, se.TIME_OFFSET}
    lin, cost = se.make_solver_functions_fast(problem, layout, obs_chunk=16384)
    mask = layout.free_mask(fixed=se.flags_to_fixed(flags))
    cfg = lm.LMConfig(max_iters=iters, ftol=0.0)
    run = jax.jit(lambda prm: lm.lm_optimize(lin, cost, layout.retract, prm,
                                             mask, cfg))

    res = run(params0)
    jax.block_until_ready(res.cost)
    log("compile + warm-up done")
    t0 = time.perf_counter()
    res = run(params0)
    jax.block_until_ready(res.cost)
    elapsed = time.perf_counter() - t0
    done = max(int(res.iterations), 1)

    # Stage breakdown (profile-derived attribution, VERDICT r1 item 2).
    jl = jax.jit(lin)
    jc = jax.jit(cost)
    H, g, c = jl(params0)
    jax.block_until_ready(H)
    t = time.perf_counter()
    H, g, c = jl(params0)
    jax.block_until_ready(H)
    t_lin = time.perf_counter() - t
    Hm = H + jnp.diag(jnp.ones_like(g))
    js = jax.jit(lm._solve_damped)
    d = js(Hm, g, 1e-4)
    jax.block_until_ready(d)
    t = time.perf_counter()
    d = js(Hm, g, 1e-4)
    jax.block_until_ready(d)
    t_solve = time.perf_counter() - t
    cc = jc(params0)
    jax.block_until_ready(cc)
    t = time.perf_counter()
    cc = jc(params0)
    jax.block_until_ready(cc)
    t_cost = time.perf_counter() - t
    breakdown = {"linearize_ms": round(t_lin * 1e3, 2),
                 "solve_ms": round(t_solve * 1e3, 2),
                 "cost_eval_ms": round(t_cost * 1e3, 2)}
    return done / elapsed, res, elapsed, done, breakdown


def stage_main():
    """Accelerator stage (in-process, default device = TPU when present)."""
    import jax
    import jax.numpy as jnp

    from openimucameracalibrator_tpu.core import spline_estimator as se

    dtype = jnp.float32
    log(f"devices: {jax.devices()}")
    problem, params0, corners, imu = build_ds3_problem(dtype)
    layout = se.build_layout(problem)
    log(f"problem built: D={layout.tangent_dim} "
        f"obs={int(np.sum(np.asarray(corners.valid)))} imu={len(imu.times)}")

    iters_per_sec, res, elapsed, done, breakdown = _timed_lm(
        problem, params0, iters=12)
    reproj = se.mean_reprojection_error(problem, res.params)
    return {
        "iters_per_sec": iters_per_sec,
        "elapsed": elapsed,
        "iterations": done,
        "reproj": float(reproj),
        "frames_per_sec": len(corners.times) * done / elapsed,
        "n_params": int(layout.tangent_dim),
        "n_observations": int(np.sum(np.asarray(corners.valid))),
        "n_imu": len(imu.times),
        "breakdown": breakdown,
        "device": str(jax.devices()[0]),
    }


def stage_cpu_baseline():
    """Measured CPU/f64 baseline: same problem, same code, host backend."""
    import jax
    import jax.numpy as jnp

    problem, params0, _, _ = build_ds3_problem(jnp.float64)
    iters_per_sec, _, elapsed, done, _ = _timed_lm(problem, params0, iters=2)
    print(json.dumps({"cpu_iters_per_sec": iters_per_sec,
                      "cpu_iterations": done, "cpu_wall_s": elapsed}))


def stage_scaling():
    """1->8 virtual-device scaling of the sharded + Schur solvers (path
    validation on CPU; true ICI scaling needs a real multi-chip slice)."""
    import jax
    import jax.numpy as jnp

    from openimucameracalibrator_tpu.core import spline_estimator as se
    from openimucameracalibrator_tpu.parallel import schur, sharded
    from openimucameracalibrator_tpu.solver import lm

    # Smaller scale: the scaling stage measures collective-path overhead,
    # not raw throughput (2 physical cores underneath).
    global DURATION, CAM_FPS, IMU_RATE
    DURATION, CAM_FPS, IMU_RATE = 12.0, 30.0, 100.0
    problem, params0, _, _ = build_ds3_problem(jnp.float32)
    flags = se.DEFAULT_FLAGS
    out = {}
    for n in (1, 2, 4, 8):
        mesh = sharded.make_mesh(n)
        t0 = time.perf_counter()
        res = sharded.optimize_sharded(problem, params0, mesh, flags,
                                       config=lm.LMConfig(max_iters=3, ftol=0.0),
                                       obs_chunk=4096, imu_chunk=1024)
        jax.block_until_ready(res.cost)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = sharded.optimize_sharded(problem, params0, mesh, flags,
                                       config=lm.LMConfig(max_iters=3, ftol=0.0),
                                       obs_chunk=4096, imu_chunk=1024)
        jax.block_until_ready(res.cost)
        dt = time.perf_counter() - t0
        out[f"data_parallel_n{n}"] = round(int(res.iterations) / dt, 3)
        log(f"scaling n={n}: {out[f'data_parallel_n{n}']} iters/s "
            f"(compile {compile_s:.0f}s)")
    mesh = sharded.make_mesh(8)
    res = schur.optimize_schur(problem, params0, mesh, flags,
                               config=lm.LMConfig(max_iters=3, ftol=0.0),
                               obs_chunk=4096, imu_chunk=1024)
    jax.block_until_ready(res.cost)
    t0 = time.perf_counter()
    res = schur.optimize_schur(problem, params0, mesh, flags,
                               config=lm.LMConfig(max_iters=3, ftol=0.0),
                               obs_chunk=4096, imu_chunk=1024)
    jax.block_until_ready(res.cost)
    out["schur_n8"] = round(int(res.iterations) / (time.perf_counter() - t0), 3)
    print(json.dumps(out))


def stage_intrinsics():
    """Multi-model intrinsics batch (BASELINE.json configs[1])."""
    import jax
    import jax.numpy as jnp

    from openimucameracalibrator_tpu.core import camera_calibrator
    from openimucameracalibrator_tpu.models import cameras
    from openimucameracalibrator_tpu.utils import synthetic
    from openimucameracalibrator_tpu.utils.types import CornerDataset

    truths = {
        "fisheye": [435.45, 435.45, 479.12, 274.46, 0.05, 0.07, -0.11, 0.05],
        "division_undistortion": [437.13, 489.07, 270.87, -1.4386e-06],
        "double_sphere": [342.43, 342.43, 472.60, 273.88, -0.215, 0.5129],
    }
    cpu = jax.devices("cpu")[0]
    datasets = {}
    with jax.default_device(cpu):
        for name, p_true in truths.items():
            model = cameras.get_model(name)
            scene = synthetic.make_intrinsics_scene(
                model, jnp.asarray(p_true), num_views=60, noise_px=0.2,
                image_size=(960, 540), seed=13)
            datasets[name] = CornerDataset(
                times=scene.frame_times, points2d=scene.observations,
                valid=scene.obs_valid,
                board_points=np.asarray(scene.board.points),
                image_size=scene.image_size, fps=30.0)
    out = {}
    t0 = time.perf_counter()
    for name, ds in datasets.items():
        calib, _ = camera_calibrator.calibrate_camera(
            ds, name, camera_calibrator.CameraCalibratorOptions(
                dtype=jnp.float32))
        out[f"reproj_{name}"] = round(float(calib.mean_reproj_error), 4)
    out["wall_s_3models"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))


def _run_sub(stage, env_extra, timeout):
    env = dict(os.environ)
    env.update(env_extra)
    try:
        r = subprocess.run([sys.executable, __file__, "--stage", stage],
                           capture_output=True, text=True, env=env,
                           timeout=timeout)
        for ln in r.stderr.splitlines():
            log(f"[{stage}] {ln}")
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 — bench must still emit its line
        log(f"[{stage}] FAILED: {e}")
        return {}


def main():
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        if stage == "cpu_baseline":
            return stage_cpu_baseline()
        if stage == "scaling":
            return stage_scaling()
        if stage == "intrinsics":
            return stage_intrinsics()
        raise SystemExit(f"unknown stage {stage}")

    t_all = time.perf_counter()
    res = stage_main()

    cpu_env = {"JAX_PLATFORMS": "cpu", "JAX_ENABLE_X64": "1"}
    base = _run_sub("cpu_baseline", cpu_env, timeout=2400)
    scaling_env = {"JAX_PLATFORMS": "cpu",
                   "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8"}
    scal = _run_sub("scaling", scaling_env, timeout=2400)
    intr = _run_sub("intrinsics", {}, timeout=1800)

    cpu_ips = base.get("cpu_iters_per_sec")
    vs = res["iters_per_sec"] / cpu_ips if cpu_ips else None
    print(json.dumps({
        "metric": "lm_iters_per_sec_gopro9_ds3_scale",
        "value": round(res["iters_per_sec"], 3),
        "unit": "LM iters/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "baseline_cpu_f64_iters_per_sec": round(cpu_ips, 4) if cpu_ips else None,
        "mean_reproj_error_px": round(res["reproj"], 4),
        "frames_per_sec": round(res["frames_per_sec"], 1),
        "lm_iterations": res["iterations"],
        "wall_s": round(res["elapsed"], 3),
        "n_params": res["n_params"],
        "n_observations": res["n_observations"],
        "n_imu_samples": res["n_imu"],
        "breakdown_ms": res["breakdown"],
        "scaling_iters_per_sec": scal,
        "multi_model_intrinsics": intr,
        "bench_total_s": round(time.perf_counter() - t_all, 1),
        "device": res["device"],
    }))


if __name__ == "__main__":
    main()
