"""CLI: IMU-to-camera rotation + time-offset initialization.

Equivalent of the reference binary ``estimate_imu_to_camera_rotation``
(/root/reference applications/estimate_imu_to_camera_rotation.cc:56-242).
"""

from __future__ import annotations

import argparse
import json


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--telemetry_json", required=True, help="generic telemetry json")
    p.add_argument("--input_pose_dataset", required=True, help="pose .npz")
    p.add_argument("--imu_rotation_init_output", required=True, help="output json")
    p.add_argument("--search_range_s", type=float, default=1.0)
    p.add_argument("--debug_dump", action="store_true",
                   help="store visual vs transformed-gyro angular velocities "
                        "in the output json (for misc_tools debug-calib)")
    return p


def run(args) -> str:
    from openimucameracalibrator_tpu.apps.estimate_poses import load_pose_dataset
    from openimucameracalibrator_tpu.core import imu_cam_rotation, telemetry

    tel = telemetry.read_generic_json(args.telemetry_json)
    poses = load_pose_dataset(args.input_pose_dataset)
    init = imu_cam_rotation.estimate_imu_to_camera_rotation(
        poses, tel.imu,
        imu_cam_rotation.RotationEstimatorOptions(search_range_s=args.search_range_s))
    out = {
        "gyro_to_camera_rotation": {
            "w": float(init.q_gyro_to_cam[0]), "x": float(init.q_gyro_to_cam[1]),
            "y": float(init.q_gyro_to_cam[2]), "z": float(init.q_gyro_to_cam[3])},
        "time_offset_gyro_to_cam": init.time_offset,
        "gyro_bias": {k: float(v) for k, v in zip("xyz", init.gyro_bias)},
    }
    if getattr(args, "debug_dump", False):
        out["debug_visual_ang_vel"] = init.debug_visual_ang_vel.tolist()
        out["debug_imu_ang_vel_transformed"] = \
            init.debug_imu_ang_vel_transformed.tolist()
    with open(args.imu_rotation_init_output, "w") as f:
        json.dump(out, f, indent=1)
    print(f"time_offset={init.time_offset:+.4f}s -> {args.imu_rotation_init_output}")
    return args.imu_rotation_init_output


def load_imu_camera_init(path: str):
    import numpy as np

    from openimucameracalibrator_tpu.utils.types import ImuCameraInit

    with open(path) as f:
        d = json.load(f)
    q = d["gyro_to_camera_rotation"]
    b = d["gyro_bias"]
    return ImuCameraInit(
        q_gyro_to_cam=np.asarray([q["w"], q["x"], q["y"], q["z"]]),
        time_offset=float(d["time_offset_gyro_to_cam"]),
        gyro_bias=np.asarray([b["x"], b["y"], b["z"]]))


def main(argv=None):
    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
