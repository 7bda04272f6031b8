"""CLI: camera intrinsic calibration from a corner file.

Equivalent of the reference binary ``calibrate_camera``
(/root/reference applications/calibrate_camera.cc:44-63).
"""

from __future__ import annotations

import argparse


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_corners", required=True)
    p.add_argument("--save_path_calib_dataset", required=True, help="output calib json")
    p.add_argument("--camera_model_to_calibrate", default="DIVISION_UNDISTORTION")
    p.add_argument("--grid_size", type=float, default=0.04)
    p.add_argument("--min_num_views", type=int, default=10)
    return p


def run(args) -> str:
    from openimucameracalibrator_tpu.core import camera_calibrator
    from openimucameracalibrator_tpu.utils import io

    ds = io.load_corners(args.input_corners)
    calib, details = camera_calibrator.calibrate_camera(
        ds, args.camera_model_to_calibrate,
        camera_calibrator.CameraCalibratorOptions(
            grid_size=args.grid_size, min_num_views=args.min_num_views))
    io.save_camera_calibration(calib, args.save_path_calib_dataset,
                               nr_calib_images=int(details["active"].sum()))
    print(f"model={calib.model_name} reproj_error={calib.mean_reproj_error:.4f}px "
          f"views={int(details['active'].sum())} -> {args.save_path_calib_dataset}")
    return args.save_path_calib_dataset


def main(argv=None):
    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
