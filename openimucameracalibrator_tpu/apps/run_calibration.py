"""CLI: the full 9-step calibration pipeline in one process.

Equivalent of the reference's master drivers
(/root/reference python/run_gopro_calibration.py:137-333 and the
run_smartphone / run_zed / run_mynteye variants, which differ only in the
telemetry importer). The reference shells out to eight binaries and passes
files between them; here each stage is a library call and artifacts are
kept in memory (optionally persisted to ``--workspace``).

Steps (run_gopro_calibration.py numbering):
  0. corner extraction (cam video + cam-imu video)
  1. intrinsic calibration
  2/3. telemetry import -> generic json
  4. static bias estimation
  5. per-frame pose estimation
  6. spline error weighting
  7. IMU-to-camera rotation + time offset init
  8. continuous-time batch calibration
  9. result summary
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path_calib_dataset", required=True,
                   help="directory with cam video, imu-cam video, telemetry")
    p.add_argument("--cam_video", default="", help="intrinsics video (default: *cam*.MP4)")
    p.add_argument("--imu_cam_video", default="", help="imu-cam video")
    p.add_argument("--telemetry_json", required=True,
                   help="telemetry file (format per --telemetry_format)")
    p.add_argument("--telemetry_format", default="generic",
                   choices=["generic", "gopro", "pygpmf", "zed", "csv"])
    p.add_argument("--camera_model", default="DIVISION_UNDISTORTION")
    p.add_argument("--board_type", default="charuco")
    p.add_argument("--checker_size_m", type=float, default=0.04)
    p.add_argument("--num_squares_x", type=int, default=10)
    p.add_argument("--num_squares_y", type=int, default=8)
    p.add_argument("--voxel_grid_size", type=float, default=0.04)
    p.add_argument("--global_shutter", action="store_true")
    p.add_argument("--workspace", default="", help="persist stage artifacts here")
    p.add_argument("--recompute_corners", action="store_true")
    return p


def _read_telemetry(path, fmt):
    from openimucameracalibrator_tpu.core import telemetry

    readers = {"generic": telemetry.read_generic_json,
               "gopro": telemetry.read_gopro_telemetry,
               "pygpmf": telemetry.read_pygpmf_json,
               "mp4": telemetry.read_gopro_mp4,
               "zed": telemetry.read_zed_jsonl,
               "csv": telemetry.read_generic_csv}
    if fmt == "gopro" and path.lower().endswith(".mp4"):
        fmt = "mp4"  # native GPMF extraction straight from the recording
    return readers[fmt](path)


def run(args) -> dict:
    from openimucameracalibrator_tpu.core import (board_extractor, camera_calibrator,
                                                  imu_cam_rotation,
                                                  imu_camera_calibrator, pose_estimator)
    from openimucameracalibrator_tpu.ops import sew as sew_mod
    from openimucameracalibrator_tpu.utils import io

    ws = args.workspace
    if ws:
        os.makedirs(ws, exist_ok=True)

    def stage(name):
        print(f"--- {name} ({time.strftime('%H:%M:%S')})")

    opts = board_extractor.BoardExtractorOptions(
        board_type=args.board_type, squares_x=args.num_squares_x,
        squares_y=args.num_squares_y, square_length=args.checker_size_m)

    stage("0a. corner extraction: intrinsics video")
    cam_video = args.cam_video or os.path.join(args.path_calib_dataset, "cam.MP4")
    corners_cam = board_extractor.extract_board_from_video(cam_video, opts)
    if ws:
        io.save_corners(corners_cam, os.path.join(ws, "cam_corners.uson"))

    stage("0b. corner extraction: imu-cam video")
    imu_video = args.imu_cam_video or os.path.join(args.path_calib_dataset, "imu_cam.MP4")
    corners_imucam = board_extractor.extract_board_from_video(imu_video, opts)
    if ws:
        io.save_corners(corners_imucam, os.path.join(ws, "imu_cam_corners.uson"))

    stage("1. intrinsic calibration")
    calib, details = camera_calibrator.calibrate_camera(
        corners_cam, args.camera_model,
        camera_calibrator.CameraCalibratorOptions(grid_size=args.voxel_grid_size))
    print(f"   reproj error: {calib.mean_reproj_error:.4f}px")
    if ws:
        io.save_camera_calibration(calib, os.path.join(ws, "cam_calib.json"))

    stage("2/3. telemetry import")
    tel = _read_telemetry(args.telemetry_json, args.telemetry_format)

    stage("4. static bias estimation")
    accel_bias, gyro_bias = sew_mod.estimate_static_biases(tel.imu)

    stage("5. pose estimation")
    poses = pose_estimator.estimate_poses(corners_imucam, calib)
    print(f"   {int(poses.valid.sum())}/{len(poses.times)} poses")

    stage("6. spline error weighting")
    sew = sew_mod.compute_sew(tel.imu, corners_imucam.fps or 30.0)
    print(f"   dt_so3={sew.dt_so3:.3f}s dt_r3={sew.dt_r3:.3f}s")

    stage("7. IMU-camera rotation + time offset")
    init = imu_cam_rotation.estimate_imu_to_camera_rotation(poses, tel.imu)
    print(f"   time offset {init.time_offset:+.4f}s")

    stage("8. continuous-time batch calibration")
    result = imu_camera_calibrator.calibrate_imu_camera(
        corners_imucam, calib, poses, tel.imu, init, sew,
        rolling_shutter=not args.global_shutter,
        accel_bias0=accel_bias, gyro_bias0=gyro_bias)
    if ws:
        io.save_imu_camera_result(result, os.path.join(ws, "imu_cam_result.json"))

    stage("9. summary")
    summary = {
        "intrinsics_reproj_error_px": calib.mean_reproj_error,
        "final_reproj_error_px": result.mean_reproj_error,
        "time_offset_s": result.time_offset,
        "line_delay_us": result.line_delay * 1e6,
        "q_i_c": result.q_i_c.tolist(),
        "t_i_c": result.t_i_c.tolist(),
        "gravity": result.gravity.tolist(),
    }
    print(json.dumps(summary, indent=1))
    return summary


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
