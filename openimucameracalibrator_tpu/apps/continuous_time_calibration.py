"""CLI: full continuous-time IMU-camera batch calibration.

Equivalent of the reference binary
``continuous_time_imu_to_camera_calibration``
(/root/reference applications/continuous_time_imu_to_camera_calibration.cc:
91-456).
"""

from __future__ import annotations

import argparse
import json


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_corners", required=True)
    p.add_argument("--camera_calibration_json", required=True)
    p.add_argument("--input_pose_dataset", required=True)
    p.add_argument("--telemetry_json", required=True)
    p.add_argument("--imu_rotation_init", required=True)
    p.add_argument("--spline_weighting_json", required=True)
    p.add_argument("--imu_bias_json", default="")
    p.add_argument("--imu_intrinsics_json", default="",
                   help="static multi-pose IMU intrinsics json "
                        "(misc_tools static-imu output; reference "
                        "read_misc.cc:84-150)")
    p.add_argument("--optimize_imu_intrinsics", action="store_true")
    p.add_argument("--output_path", required=True)
    p.add_argument("--global_shutter", action="store_true")
    p.add_argument("--max_iters", type=int, default=50)
    p.add_argument("--line_delay_iters", type=int, default=10)
    p.add_argument("--no_time_offset_refinement", action="store_true",
                   help="reference-parity mode: freeze the init offset")
    p.add_argument("--profile_trace_dir", default="",
                   help="write a jax.profiler trace of the batch "
                        "optimization to this directory (view in "
                        "TensorBoard/XProf)")
    p.add_argument("--solver_checkpoint_dir", default="",
                   help="snapshot the solution after every LM stage and "
                        "resume from completed stages on rerun")
    # Multi-host launch (parallel/multihost.py): pass the coordinator to
    # join a jax.distributed pod; single-host runs leave these unset.
    p.add_argument("--coordinator_address", default="",
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    return p


def maybe_init_distributed(args) -> bool:
    """Join a multi-host pod when requested (no-op single-host)."""
    from openimucameracalibrator_tpu.parallel import multihost

    return multihost.initialize(
        coordinator_address=getattr(args, "coordinator_address", "") or None,
        num_processes=getattr(args, "num_processes", 0) or None,
        process_id=(getattr(args, "process_id", -1)
                    if getattr(args, "process_id", -1) >= 0 else None))


def run(args) -> str:
    import numpy as np

    if maybe_init_distributed(args):
        import jax
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    from openimucameracalibrator_tpu.apps.estimate_imu_to_camera_rotation import \
        load_imu_camera_init
    from openimucameracalibrator_tpu.apps.estimate_poses import load_pose_dataset
    from openimucameracalibrator_tpu.core import imu_camera_calibrator, telemetry
    from openimucameracalibrator_tpu.utils import io
    from openimucameracalibrator_tpu.utils.types import SplineWeightingData

    corners = io.load_corners(args.input_corners)
    calib = io.load_camera_calibration(args.camera_calibration_json)
    poses = load_pose_dataset(args.input_pose_dataset)
    tel = telemetry.read_generic_json(args.telemetry_json)
    init = load_imu_camera_init(args.imu_rotation_init)
    with open(args.spline_weighting_json) as f:
        sw = json.load(f)
    sew = SplineWeightingData(
        dt_so3=sw["so3"]["knot_spacing"], dt_r3=sw["r3"]["knot_spacing"],
        std_so3=sw["so3"]["weighting_factor"], std_r3=sw["r3"]["weighting_factor"],
        cam_fps=sw.get("camera_fps", 30.0))
    accel_bias0 = gyro_bias0 = None
    if args.imu_bias_json:
        with open(args.imu_bias_json) as f:
            b = json.load(f)
        accel_bias0 = np.asarray([b["accl_bias"][k] for k in "xyz"])
        gyro_bias0 = np.asarray([b["gyro_bias"][k] for k in "xyz"])

    accl_intr = gyro_intr = None
    if args.imu_intrinsics_json:
        accl_intr, gyro_intr = io.load_imu_intrinsics(args.imu_intrinsics_json)

    import contextlib

    import jax

    trace_ctx = (jax.profiler.trace(args.profile_trace_dir)
                 if getattr(args, "profile_trace_dir", "")
                 else contextlib.nullcontext())
    with trace_ctx:
        result = imu_camera_calibrator.calibrate_imu_camera(
            corners, calib, poses, tel.imu, init, sew,
            rolling_shutter=not args.global_shutter,
            accel_bias0=accel_bias0, gyro_bias0=gyro_bias0,
            accl_intrinsics=accl_intr, gyro_intrinsics=gyro_intr,
            optimize_imu_intrinsics=args.optimize_imu_intrinsics,
            refine_time_offset=not args.no_time_offset_refinement,
            max_iters=args.max_iters, line_delay_iters=args.line_delay_iters,
            checkpoint_dir=getattr(args, "solver_checkpoint_dir", "") or None)
    io.save_imu_camera_result(result, args.output_path)
    print(f"final reproj error: {result.mean_reproj_error:.4f}px, "
          f"time offset {result.time_offset:+.4f}s, "
          f"line delay {result.line_delay * 1e6:.2f}us -> {args.output_path}")
    return args.output_path


def main(argv=None):
    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
