"""CLI: per-frame pose estimation with fixed intrinsics.

Equivalent of the reference binary ``estimate_camera_poses_from_checkerboard``
(/root/reference applications/estimate_camera_poses_from_checkerboard.cc:43-78).
Poses are written as an npz artifact (the reference uses a Theia-binary
.calibdata file; npz is our native equivalent).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_corners", required=True)
    p.add_argument("--camera_calibration_json", required=True)
    p.add_argument("--output_pose_dataset", required=True, help="output .npz")
    p.add_argument("--optimize_board_points", action="store_true")
    return p


def run(args) -> str:
    from openimucameracalibrator_tpu.core import pose_estimator
    from openimucameracalibrator_tpu.utils import io

    ds = io.load_corners(args.input_corners)
    calib = io.load_camera_calibration(args.camera_calibration_json)
    poses = pose_estimator.estimate_poses(ds, calib)
    np.savez(args.output_pose_dataset, times=poses.times, q_w_c=poses.q_w_c,
             t_w_c=poses.t_w_c, valid=poses.valid, board_points=poses.board_points)
    print(f"{int(poses.valid.sum())}/{len(poses.times)} poses -> {args.output_pose_dataset}")
    return args.output_pose_dataset


def load_pose_dataset(path: str):
    from openimucameracalibrator_tpu.utils.types import PoseDataset

    z = np.load(path)
    return PoseDataset(times=z["times"], q_w_c=z["q_w_c"], t_w_c=z["t_w_c"],
                       valid=z["valid"], board_points=z["board_points"])


def main(argv=None):
    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
