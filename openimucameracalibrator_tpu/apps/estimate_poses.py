"""CLI: per-frame pose estimation with fixed intrinsics.

Equivalent of the reference binary ``estimate_camera_poses_from_checkerboard``
(/root/reference applications/estimate_camera_poses_from_checkerboard.cc:43-78).
Poses are written as an npz artifact, or — when the output path ends in
``.calibdata`` — as the reference's Theia-binary pose dataset
(utils/theia_io.py), so a mixed native/reference pipeline can hand off
at the pose stage in either direction.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_corners", required=True)
    p.add_argument("--camera_calibration_json", required=True)
    p.add_argument("--output_pose_dataset", required=True,
                   help="output .npz (native) or .calibdata (Theia binary)")
    p.add_argument("--optimize_board_points", action="store_true")
    return p


def run(args) -> str:
    from openimucameracalibrator_tpu.core import pose_estimator
    from openimucameracalibrator_tpu.utils import io

    ds = io.load_corners(args.input_corners)
    calib = io.load_camera_calibration(args.camera_calibration_json)
    poses = pose_estimator.estimate_poses(ds, calib)
    if args.output_pose_dataset.endswith(".calibdata"):
        # Theia-binary pose dataset, the reference artifact
        # (estimate_camera_poses_from_checkerboard.cc:71).
        from openimucameracalibrator_tpu.utils import theia_io
        theia_io.save_pose_dataset_calibdata(args.output_pose_dataset,
                                             poses, calib)
    else:
        np.savez(args.output_pose_dataset, times=poses.times,
                 q_w_c=poses.q_w_c, t_w_c=poses.t_w_c, valid=poses.valid,
                 board_points=poses.board_points)
    print(f"{int(poses.valid.sum())}/{len(poses.times)} poses -> {args.output_pose_dataset}")
    return args.output_pose_dataset


def load_pose_dataset(path: str):
    from openimucameracalibrator_tpu.utils.types import PoseDataset

    if path.endswith(".calibdata"):
        from openimucameracalibrator_tpu.utils import theia_io
        poses, _, _ = theia_io.load_pose_dataset_calibdata(path)
        return poses
    z = np.load(path)
    return PoseDataset(times=z["times"], q_w_c=z["q_w_c"], t_w_c=z["t_w_c"],
                       valid=z["valid"], board_points=z["board_points"])


def main(argv=None):
    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
