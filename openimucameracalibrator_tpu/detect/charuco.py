"""Charuco corner detection: markers -> interpolated chessboard corners.

Native replacement for cv2.aruco.interpolateCornersCharuco as used by the
reference's BoardExtractor charuco path (/root/reference
src/core/board_extractor.cc:135-173): detected marker corners anchor local
board->image homographies; chessboard corner positions are predicted from
those and refined to subpixel on the image; a corner-response check rejects
predictions that do not land on an x-corner.

Board conventions match models/boards.py + detect/render.py: squares (sx,
sy) from the top-left, (sx+sy) even = black, markers row-major in white
squares, charuco corner id k at board point ((k % (nx) + 1) * s,
(k // nx + 1) * s) with nx = squares_x - 1.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from openimucameracalibrator_tpu.detect import aruco_dict as adict_sub
from openimucameracalibrator_tpu.detect import image as im
from openimucameracalibrator_tpu.detect import quads
from openimucameracalibrator_tpu.detect.aruco_dict import (ArucoDictionary,
                                                           aruco_original_dictionary)
from openimucameracalibrator_tpu.detect.render import _white_squares
from openimucameracalibrator_tpu.ops import pnp


@dataclasses.dataclass
class CharucoBoardSpec:
    squares_x: int = 10
    squares_y: int = 8
    square_length: float = 0.04
    marker_length: float = 0.03
    dictionary: ArucoDictionary | None = None

    def __post_init__(self):
        if self.dictionary is None:
            self.dictionary = aruco_original_dictionary()

    def marker_board_corners(self) -> tuple[np.ndarray, np.ndarray]:
        """(marker_ids (Nw,), corners (Nw, 4, 2)): board-frame (x, y) of each
        marker's TL,TR,BR,BL corners (board +y = image-down on the board)."""
        s, ml = self.square_length, self.marker_length
        off = (s - ml) / 2.0
        ids, corners = [], []
        for mid, (sx, sy) in enumerate(_white_squares(self.squares_x, self.squares_y)):
            x0, y0 = sx * s + off, sy * s + off
            corners.append([(x0, y0), (x0 + ml, y0), (x0 + ml, y0 + ml), (x0, y0 + ml)])
            ids.append(mid)
        return np.asarray(ids), np.asarray(corners, np.float64)

    def chessboard_corners(self) -> np.ndarray:
        """(N, 2) board-frame positions of charuco corners, id order."""
        nx, ny = self.squares_x - 1, self.squares_y - 1
        xs, ys = np.meshgrid(np.arange(1, nx + 1), np.arange(1, ny + 1))
        return np.stack([xs.ravel(), ys.ravel()], -1) * self.square_length


@dataclasses.dataclass
class CharucoDetectorOptions:
    marker: quads.MarkerDetectorOptions = dataclasses.field(
        default_factory=quads.MarkerDetectorOptions)
    min_markers: int = 2
    local_markers: int = 4  # nearest markers used per corner homography
    subpix_win: int = 5
    max_residual_px: float = 5.0  # refined-vs-predicted distance gate
    response_check: bool = True


def detect_charuco(gray: np.ndarray, spec: CharucoBoardSpec,
                   opts: CharucoDetectorOptions | None = None):
    """Detect charuco corners in one grayscale frame.

    Returns (corner_ids (K,), corners_px (K, 2)).
    """
    import jax.numpy as jnp

    opts = opts or CharucoDetectorOptions()
    board_mids, board_mcorners = spec.marker_board_corners()
    # Decode against the BOARD's id subset, not the full dictionary: a
    # misdecode onto another valid board id corrupts the local corner
    # homographies (whole neighborhoods shift by one square); the subset
    # raises the effective code distance and re-derives the correction
    # budget from it (see aruco_dict.subset_dictionary).
    sub, id_map = adict_sub.subset_dictionary(spec.dictionary, board_mids)
    mids_sub, mcorners = quads.detect_markers(gray, sub, opts.marker)
    mids = id_map[mids_sub]
    if len(mids) < opts.min_markers:
        return np.zeros((0,), np.int64), np.zeros((0, 2))

    # Board-frame positions of the observed marker corners.
    obs_board = board_mcorners[mids]  # (M, 4, 2)
    obs_img = mcorners  # (M, 4, 2)
    marker_ctr_board = obs_board.mean(axis=1)  # (M, 2)

    chess = spec.chessboard_corners()  # (N, 2)
    N = chess.shape[0]
    gray_j = jnp.asarray(gray.astype(np.float32))

    # Per-corner local homography from the nearest `local_markers` markers.
    preds = np.zeros((N, 2))
    ok = np.zeros((N,), bool)
    n_loc = min(opts.local_markers, len(mids))
    src_sets = {}
    for k in range(N):
        d = np.linalg.norm(marker_ctr_board - chess[k], axis=1)
        sel = tuple(np.sort(np.argsort(d)[:n_loc]))
        src_sets.setdefault(sel, []).append(k)
    for sel, corner_ids in src_sets.items():
        sel = list(sel)
        bp = obs_board[sel].reshape(-1, 2)
        ip = obs_img[sel].reshape(-1, 2)
        H = np.asarray(pnp.homography_dlt(jnp.asarray(bp[None]), jnp.asarray(ip[None]),
                                          jnp.ones((1, bp.shape[0])))[0])
        if not np.isfinite(H).all() or abs(H[2, 2]) < 1e-12:
            continue
        pts = np.concatenate([chess[corner_ids], np.ones((len(corner_ids), 1))], axis=1) @ H.T
        w = pts[:, 2:3]
        good = np.abs(w[:, 0]) > 1e-9
        preds[corner_ids] = np.where(good[:, None], pts[:, :2] / np.where(good[:, None], w, 1.0), 0.0)
        ok[np.asarray(corner_ids)[good]] = True

    h, w_img = gray.shape
    inb = (preds[:, 0] > 3) & (preds[:, 0] < w_img - 4) & \
          (preds[:, 1] > 3) & (preds[:, 1] < h - 4)
    ok &= inb
    if not ok.any():
        return np.zeros((0,), np.int64), np.zeros((0, 2))

    cand = preds[ok]
    refined = np.array(im.refine_corners_subpix(gray_j, jnp.asarray(cand),
                                                win=opts.subpix_win))
    drift = np.linalg.norm(refined - cand, axis=1)
    good = drift < opts.max_residual_px

    if opts.response_check:
        resp = np.asarray(im.corner_response(gray_j))
        rx = np.clip(np.round(refined[:, 0]).astype(int), 0, w_img - 1)
        ry = np.clip(np.round(refined[:, 1]).astype(int), 0, h - 1)
        thr = 0.02 * resp.max() if resp.max() > 0 else 0.0
        good &= resp[ry, rx] > thr

    ids_out = np.nonzero(ok)[0][good]
    return ids_out.astype(np.int64), refined[good].astype(np.float64)
