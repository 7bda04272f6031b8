"""Board corner extraction from videos / image folders.

Equivalent of the reference's BoardExtractor
(/root/reference src/core/board_extractor.cc:127-482: ExtractBoard /
ExtractVideoToJson / ExtractImageFolderToJson) and the board-PNG generator
(applications/create_charuco_board.cc:30-67).

Two detection backends behind one interface:

* ``native`` (default): the in-house TPU-first stack in
  openimucameracalibrator_tpu.detect — JAX adaptive threshold / corner
  response / subpixel refinement / marker-bit decode, host-side quad and
  lattice logic. No OpenCV required.
* ``opencv``: the reference's own detectors (aruco/charuco
  board_extractor.cc:135-173, findChessboardCornersSB :205, apriltag via
  the 36h11 dictionary :226-232) when cv2 is installed — useful for
  cross-validating the native detector on real footage.

Video decode needs a host decoder (cv2 or imageio); image folders are read
with PIL. Output is the statically-shaped CornerDataset artifact the TPU
pipeline consumes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Iterator, Tuple

import numpy as np

from openimucameracalibrator_tpu.detect import aruco_dict as adict_mod
from openimucameracalibrator_tpu.detect import charuco as charuco_mod
from openimucameracalibrator_tpu.detect import checkerboard as checker_mod
from openimucameracalibrator_tpu.detect import quads as quads_mod
from openimucameracalibrator_tpu.detect import render as render_mod
from openimucameracalibrator_tpu.models import boards as boards_mod
from openimucameracalibrator_tpu.utils.types import CornerDataset


@dataclasses.dataclass
class BoardExtractorOptions:
    board_type: str = "charuco"
    squares_x: int = 10
    squares_y: int = 8
    square_length: float = 0.04
    marker_length: float = 0.03
    aruco_dict: str = "DICT_ARUCO_ORIGINAL"  # board_extractor.cc:46 default
    downsample_factor: float = 1.0  # resize 1/f (board_extractor.cc:414-430)
    backend: str = "native"  # "native" | "opencv"
    dictionary: object = None  # explicit ArucoDictionary override
    verbose: bool = False
    # Batched video pipeline (detect/video.py): frames processed in
    # F-frame blocks with one device program per pixel stage, decode
    # overlapped on a background thread — the video-scale replacement for
    # the reference's per-frame loop (board_extractor.cc:385-482). Applies
    # to the native charuco path; other board types / backends fall back
    # to per-frame detection.
    batched_video: bool = True
    batch_frames: int = 32
    # Detector-parameter config file (OpenCV-YAML or json) — the
    # reference's --aruco_detector_params / charuco_detector_params.yml
    # (src/utils/utils.cc:43-75); parsed by detect/params.py.
    detector_params_path: str = ""


def _native_dictionary(opts: BoardExtractorOptions) -> adict_mod.ArucoDictionary:
    if opts.dictionary is not None:
        return opts.dictionary
    if opts.aruco_dict.upper() in ("DICT_ARUCO_ORIGINAL", "ARUCO_ORIGINAL"):
        return adict_mod.aruco_original_dictionary()
    if opts.aruco_dict.upper() in ("DICT_APRILTAG_36H11", "TAG36H11"):
        return adict_mod.tag36h11_dictionary()
    raise ValueError(f"unknown dictionary {opts.aruco_dict!r} for native backend")


def _detector_params(opts: BoardExtractorOptions, image_size=None):
    """Parsed detector-parameter file, or None when not configured."""
    if not opts.detector_params_path:
        return None
    from openimucameracalibrator_tpu.detect import params as params_mod

    return params_mod.load_detector_params(opts.detector_params_path,
                                           image_size=image_size)


def make_native_detector(opts: BoardExtractorOptions):
    """detect(gray) -> (ids, corners_px) using the in-house stack."""
    bt = boards_mod.BoardType(opts.board_type.lower())
    dp = _detector_params(opts)
    if bt == boards_mod.BoardType.CHARUCO:
        spec = charuco_mod.CharucoBoardSpec(
            opts.squares_x, opts.squares_y, opts.square_length,
            opts.marker_length, _native_dictionary(opts))
        copts = dp.charuco if dp else None
        return lambda g: charuco_mod.detect_charuco(np.asarray(g, np.float32),
                                                    spec, copts)
    if bt == boards_mod.BoardType.RADON:
        return lambda g: checker_mod.detect_checkerboard(
            np.asarray(g, np.float32), opts.squares_x, opts.squares_y)

    # Kalibr-style aprilgrids always use the tag36h11 family
    # (board_extractor.cc:226-232, resource/kalibr_apriltag.yaml).
    dictionary = (opts.dictionary if opts.dictionary is not None
                  else adict_mod.tag36h11_dictionary())

    def detect_april(gray):
        mids, mcorners = quads_mod.detect_markers(np.asarray(gray, np.float32),
                                                  dictionary,
                                                  dp.marker if dp else None)
        # Marker-image corner j (TL,TR,BR,BL) maps to aprilgrid board corner
        # 4*t + [3,2,1,0][j] (board +y up; see models/boards.py::apriltag_board
        # and detect/render.py::render_aprilgrid).
        board_c = (3, 2, 1, 0)
        ids, pts = [], []
        for t, cs in zip(mids, mcorners):
            for j in range(4):
                ids.append(4 * int(t) + board_c[j])
                pts.append(cs[j])
        return (np.asarray(ids, np.int64) if ids else np.zeros((0,), np.int64),
                np.asarray(pts) if pts else np.zeros((0, 2)))

    return detect_april


# ---------------------------------------------------------------------------
# Optional OpenCV backend (cross-validation / video decode)
# ---------------------------------------------------------------------------

def _cv2():
    import cv2
    return cv2


def _make_charuco_detector(opts: BoardExtractorOptions):
    cv2 = _cv2()
    adict = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, opts.aruco_dict))
    board = cv2.aruco.CharucoBoard(
        (opts.squares_x, opts.squares_y), opts.square_length, opts.marker_length,
        adict)
    params = cv2.aruco.CharucoParameters()
    det_params = cv2.aruco.DetectorParameters()
    det_params.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_SUBPIX
    return cv2.aruco.CharucoDetector(board, params, det_params), board


def detect_charuco_cv(gray: np.ndarray, detector) -> Tuple[np.ndarray, np.ndarray]:
    """(corner ids (K,), corners (K, 2)) for one grayscale frame."""
    corners, ids, _, _ = detector.detectBoard(gray)
    if corners is None or ids is None or len(corners) == 0:
        return np.zeros((0,), np.int64), np.zeros((0, 2), np.float64)
    return ids.reshape(-1).astype(np.int64), corners.reshape(-1, 2).astype(np.float64)


def detect_radon_cv(gray: np.ndarray, opts: BoardExtractorOptions):
    """findChessboardCornersSB path (board_extractor.cc:205)."""
    cv2 = _cv2()
    nx, ny = opts.squares_x - 1, opts.squares_y - 1
    found, corners = cv2.findChessboardCornersSB(
        gray, (nx, ny), flags=cv2.CALIB_CB_ACCURACY)
    if not found:
        return np.zeros((0,), np.int64), np.zeros((0, 2), np.float64)
    return np.arange(nx * ny, dtype=np.int64), corners.reshape(-1, 2).astype(np.float64)


def detect_apriltag_cv(gray: np.ndarray, detector):
    """Kalibr-style aprilgrid via cv2 aruco: tag t corner c -> id 4*t + c."""
    corners, ids, _ = detector.detectMarkers(gray)
    if ids is None or len(ids) == 0:
        return np.zeros((0,), np.int64), np.zeros((0, 2), np.float64)
    out_ids, out_pts = [], []
    for tag_id, cs in zip(ids.reshape(-1), corners):
        for c in range(4):
            out_ids.append(4 * int(tag_id) + c)
            out_pts.append(cs[0, c])
    return np.asarray(out_ids, np.int64), np.asarray(out_pts, np.float64)


def make_opencv_detector(opts: BoardExtractorOptions):
    cv2 = _cv2()
    bt = boards_mod.BoardType(opts.board_type.lower())
    if bt == boards_mod.BoardType.CHARUCO:
        detector, _ = _make_charuco_detector(opts)
        return lambda g: detect_charuco_cv(g, detector)
    if bt == boards_mod.BoardType.RADON:
        return lambda g: detect_radon_cv(g, opts)
    adict = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    det_params = cv2.aruco.DetectorParameters()
    det_params.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_SUBPIX
    detector = cv2.aruco.ArucoDetector(adict, det_params)
    return lambda g: detect_apriltag_cv(g, detector)


# ---------------------------------------------------------------------------
# Frame sources
# ---------------------------------------------------------------------------

def iter_video_frames(video_path: str, downsample: float = 1.0) -> Iterator[tuple]:
    """(timestamp_s, gray frame) per video frame (board_extractor.cc:385-430).

    Tolerates up to 500 consecutive bad reads like the reference
    (:415-418). Requires cv2 for decode.
    """
    cv2 = _cv2()
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(video_path)
    bad = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            bad += 1
            if bad > 500:
                break
            if cap.get(cv2.CAP_PROP_POS_FRAMES) >= cap.get(cv2.CAP_PROP_FRAME_COUNT):
                break
            continue
        bad = 0
        t = cap.get(cv2.CAP_PROP_POS_MSEC) * 1e-3
        if downsample and downsample != 1.0:
            frame = cv2.resize(frame, None, fx=1.0 / downsample, fy=1.0 / downsample)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        yield t, gray
    cap.release()


def load_gray_image(path: str) -> np.ndarray:
    """Grayscale uint8 image via PIL (no OpenCV dependency)."""
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("L"))


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(img, np.uint8)).save(path)


# ---------------------------------------------------------------------------
# Extraction drivers
# ---------------------------------------------------------------------------

def extract_board(frames: Iterable[tuple], opts: BoardExtractorOptions,
                  fps: float = 0.0) -> CornerDataset:
    """Detect board corners on an iterable of (time_s, gray) frames."""
    board = boards_mod.make_board(opts.board_type, opts.squares_x, opts.squares_y,
                                  opts.square_length, opts.marker_length)
    times, all_ids, all_pts = [], [], []
    shape = None
    bt = boards_mod.BoardType(opts.board_type.lower())
    if (opts.batched_video and opts.backend == "native"
            and bt == boards_mod.BoardType.CHARUCO):
        from openimucameracalibrator_tpu.detect import video as video_mod

        spec = charuco_mod.CharucoBoardSpec(
            opts.squares_x, opts.squares_y, opts.square_length,
            opts.marker_length, _native_dictionary(opts))
        dp = _detector_params(opts)
        vopts = video_mod.VideoDetectorOptions(batch_frames=opts.batch_frames)
        if dp is not None:
            vopts.marker = dp.marker
            vopts.subpix_win = dp.charuco.subpix_win
            vopts.max_residual_px = dp.charuco.max_residual_px
            vopts.min_markers = dp.charuco.min_markers
            vopts.local_markers = dp.charuco.local_markers

        def tap(it):
            nonlocal shape
            for t, g in it:
                shape = g.shape
                yield t, g

        for t, ids, pts in video_mod.detect_charuco_video(tap(frames), spec,
                                                          vopts):
            times.append(t)
            all_ids.append(np.asarray(ids, np.int64))
            all_pts.append(np.asarray(pts, np.float64).reshape(-1, 2))
    else:
        if opts.backend == "opencv":
            detect = make_opencv_detector(opts)
        else:
            detect = make_native_detector(opts)
        for t, gray in frames:
            shape = gray.shape
            ids, pts = detect(gray)
            times.append(t)
            all_ids.append(np.asarray(ids, np.int64))
            all_pts.append(np.asarray(pts, np.float64).reshape(-1, 2))

    P = board.num_points
    V = len(times)
    pts2d = np.zeros((V, P, 2), np.float64)
    valid = np.zeros((V, P), bool)
    for v, (ids, pts) in enumerate(zip(all_ids, all_pts)):
        keep = ids < P
        pts2d[v, ids[keep]] = pts[keep]
        valid[v, ids[keep]] = True
    image_size = (shape[1], shape[0]) if shape is not None else (0, 0)
    if fps == 0.0 and len(times) > 1:
        dts = np.diff(times)
        fps = 1.0 / float(np.median(dts[dts > 0])) if (np.asarray(dts) > 0).any() else 0.0
    return CornerDataset(times=np.asarray(times), points2d=pts2d, valid=valid,
                         board_points=board.points, image_size=image_size, fps=fps)


def extract_board_from_video(video_path: str, opts: BoardExtractorOptions) -> CornerDataset:
    return extract_board(iter_video_frames(video_path, opts.downsample_factor), opts)


def extract_board_from_image_folder(folder: str, fps: float,
                                    opts: BoardExtractorOptions) -> CornerDataset:
    """Image-folder path (board_extractor.cc:268-383); frame time = k/fps."""
    files = sorted(os.listdir(folder))
    files = [f for f in files if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))]

    def gen():
        for k, fname in enumerate(files):
            img = load_gray_image(os.path.join(folder, fname))
            if opts.downsample_factor and opts.downsample_factor != 1.0:
                s = int(opts.downsample_factor)
                img = img[::s, ::s]
            yield k / fps, img

    return extract_board(gen(), opts, fps=fps)


def render_charuco_board_image(opts: BoardExtractorOptions, px_per_square: int = 100,
                               margin_px: int = 20) -> np.ndarray:
    """Printable board PNG (create_charuco_board.cc:30-67), native renderer."""
    return render_mod.render_charuco_board(
        _native_dictionary(opts), opts.squares_x, opts.squares_y,
        opts.square_length, opts.marker_length, px_per_square, margin_px)
