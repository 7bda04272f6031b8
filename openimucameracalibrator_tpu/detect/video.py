"""Video-scale batched charuco detection.

The reference's detection hot loop is strictly per-frame: one OpenCV
pipeline invocation per video frame over 1-2k-frame recordings
(/root/reference src/core/board_extractor.cc:385-482). This module
re-architects that loop for TPU: frames are processed in fixed-size
blocks, every pixel stage runs as ONE batched device program per block,
and the only per-frame host work left is the irregular connected-
component/quad-graph stage — run on 2x-downsampled masks and overlapped
with video decode on a background thread.

Per F-frame block:

1. ``_stage_pixels``  (device, 1 call): uint8 frames -> f32 gray (stays
   device-resident), adaptive-threshold dark mask max-pooled to 1/down
   resolution (the only per-pixel array fetched to host), and the
   checkerboard corner-response map (device-resident, consumed by stage
   3's response gate).
2. host: per-frame quad candidates from the downsampled mask (scipy
   label + convex hull, coordinates scaled back up); padded to a static
   (F, Q, 4, 2) tensor. Half-resolution corner error (~2 px) is inside
   the subpixel-refinement basin, so accuracy is set by stage 3.
3. ``_stage_markers`` (device, 1 call): batched subpixel refinement of
   all quad corners, per-quad DLT homographies, marker-cell grid
   sampling. Bit thresholding + dictionary decode stay host-side numpy
   (a tiny matmul).
4. ``_stage_charuco`` (device, 1 call): for every chessboard corner of
   every frame, a local homography from the nearest ``local_markers``
   decoded markers (batched DLT), corner prediction, batched subpixel
   refinement, drift + corner-response gates.

The single-frame path (detect/charuco.py) remains the reference
implementation; equality is tested corner-for-corner in
tests/test_video_detect.py.
"""

from __future__ import annotations

import dataclasses
import functools
import queue as queue_mod
import threading
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.detect import aruco_dict as adict_mod
from openimucameracalibrator_tpu.detect import charuco as charuco_mod
from openimucameracalibrator_tpu.detect import image as im
from openimucameracalibrator_tpu.detect import quads as quads_mod
from openimucameracalibrator_tpu.ops import pnp


@dataclasses.dataclass
class VideoDetectorOptions:
    batch_frames: int = 16
    max_quads: int = 64          # static quad slots per frame
    label_downsample: int = 2    # mask resolution divisor for host labeling
    marker: quads_mod.MarkerDetectorOptions = dataclasses.field(
        default_factory=quads_mod.MarkerDetectorOptions)
    min_markers: int = 2
    local_markers: int = 4
    subpix_win: int = 5
    max_residual_px: float = 5.0
    response_check: bool = True
    decode_queue: int = 4        # prefetched frame blocks


# ---------------------------------------------------------------------------
# Device stages (all shapes static per (F, H, W) configuration)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("radius", "down", "resp_radius",
                                             "want_resp"))
def _stage_pixels(frames_u8, radius: int, c: float, down: int,
                  resp_radius: int, want_resp: bool):
    """(gray_f32 (F,H,W), maskd (F,H/down,W/down) bool, resp (F,H,W))."""
    gray = frames_u8.astype(jnp.float32)
    mask = jax.vmap(lambda g: im.adaptive_threshold(g, radius, c))(gray)
    if down > 1:
        maskd = jax.lax.reduce_window(mask, False, jax.lax.bitwise_or,
                                      (1, down, down), (1, down, down),
                                      "VALID")
    else:
        maskd = mask
    resp = (jax.vmap(lambda g: im._corner_response_xla(g, resp_radius))(gray)
            if want_resp else jnp.zeros((gray.shape[0], 1, 1), jnp.float32))
    return gray, maskd, resp


@functools.partial(jax.jit, static_argnames=("cells", "oversample", "win"))
def _stage_markers(gray, quads_b, qvalid, cells: int, oversample: int,
                   win: int):
    """Batched quad refinement + homography grid sampling.

    gray (F,H,W) f32; quads_b (F,Q,4,2); qvalid (F,Q) bool.
    Returns (quads_refined (F,Q,4,2), grids (F,Q,cells,cells)).
    """
    F, Q = quads_b.shape[:2]
    flat = quads_b.reshape(F, Q * 4, 2)
    ref = jax.vmap(lambda g, cs: im.refine_corners_subpix(g, cs, win=win))(
        gray, flat)
    drift = jnp.linalg.norm(ref - flat, axis=-1)
    ref = jnp.where((drift > win + 1.0)[..., None], flat, ref)
    quads_r = ref.reshape(F, Q, 4, 2)

    src = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]],
                      jnp.float32)
    src_b = jnp.broadcast_to(src, (F, Q, 4, 2))
    Hs = pnp.homography_dlt(src_b, quads_r.astype(jnp.float32),
                            jnp.ones((F, Q, 4), jnp.float32))
    Hs = Hs / jnp.where(jnp.abs(Hs[..., 2:3, 2:3]) > 1e-12,
                        Hs[..., 2:3, 2:3], 1.0)
    grids = jax.vmap(lambda g, hs: jax.vmap(
        lambda H: im.sample_homography_grid(g, H, cells, cells, oversample))(
            hs))(gray, Hs)
    grids = jnp.where(qvalid[:, :, None, None], grids, 0.0)
    return quads_r, grids


@functools.partial(jax.jit, static_argnames=("n_loc", "win", "min_markers",
                                             "response_check"))
def _stage_charuco(gray, resp, mk_board, mk_img, mk_valid, chess,
                   n_loc: int, win: int, min_markers: int,
                   max_residual_px: float, response_check: bool):
    """Batched charuco corner interpolation (one call per frame block).

    mk_board/mk_img (F,M,4,2) board/image marker corners, mk_valid (F,M).
    chess (N,2) board-frame chessboard corner positions.
    Returns (refined (F,N,2), valid (F,N)).
    """
    F, M = mk_valid.shape
    N = chess.shape[0]
    ctr_board = mk_board.mean(axis=2)  # (F, M, 2)
    d = jnp.linalg.norm(ctr_board[:, None, :, :] - chess[None, :, None, :],
                        axis=-1)  # (F, N, M)
    d = jnp.where(mk_valid[:, None, :], d, jnp.inf)
    _, idx = jax.lax.top_k(-d, n_loc)  # (F, N, n_loc) nearest markers

    def gather_m(arr_f, idx_f):  # (M,4,2), (N,n_loc) -> (N,n_loc,4,2)
        return arr_f[idx_f]

    bp = jax.vmap(gather_m)(mk_board, idx).reshape(F, N, n_loc * 4, 2)
    ip = jax.vmap(gather_m)(mk_img, idx).reshape(F, N, n_loc * 4, 2)
    selv = jax.vmap(lambda v, i: v[i])(mk_valid, idx)  # (F, N, n_loc)
    w = jnp.repeat(selv, 4, axis=-1).astype(jnp.float32)  # (F, N, n_loc*4)

    H = pnp.homography_dlt(bp.astype(jnp.float32), ip.astype(jnp.float32), w)
    ch = jnp.concatenate([jnp.broadcast_to(chess, (F, N, 2)),
                          jnp.ones((F, N, 1))], axis=-1).astype(jnp.float32)
    pred_h = jnp.einsum("fnij,fnj->fni", H, ch)
    wz = pred_h[..., 2]
    ok = (jnp.isfinite(H).all(axis=(-2, -1)) & (jnp.abs(wz) > 1e-9)
          & (selv.sum(-1) >= min(n_loc, 1)))
    pred = pred_h[..., :2] / jnp.where(jnp.abs(wz) > 1e-9, wz, 1.0)[..., None]

    n_mk = mk_valid.sum(-1)  # (F,)
    ok = ok & (n_mk >= min_markers)[:, None]
    h_img, w_img = gray.shape[1:]
    inb = ((pred[..., 0] > 3) & (pred[..., 0] < w_img - 4)
           & (pred[..., 1] > 3) & (pred[..., 1] < h_img - 4))
    ok = ok & inb
    pred = jnp.where(ok[..., None], pred, 8.0)  # park invalid slots in-bounds

    refined = jax.vmap(lambda g, cs: im.refine_corners_subpix(g, cs, win=win))(
        gray, pred)
    drift = jnp.linalg.norm(refined - pred, axis=-1)
    ok = ok & (drift < max_residual_px)

    if response_check:
        rx = jnp.clip(jnp.round(refined[..., 0]).astype(jnp.int32), 0,
                      w_img - 1)
        ry = jnp.clip(jnp.round(refined[..., 1]).astype(jnp.int32), 0,
                      h_img - 1)
        rv = jax.vmap(lambda r, y, x: r[y, x])(resp, ry, rx)  # (F, N)
        rmax = resp.max(axis=(1, 2))  # (F,)
        thr = jnp.where(rmax > 0, 0.02 * rmax, 0.0)
        ok = ok & (rv > thr[:, None])
    return refined, ok


# ---------------------------------------------------------------------------
# Host stages
# ---------------------------------------------------------------------------

def _host_quads(maskd_np: np.ndarray, opts: VideoDetectorOptions):
    """Per-frame quad candidates from the downsampled mask block.

    Returns (quads_b (F, Q, 4, 2) float32 full-res coords, qvalid (F, Q)).
    """
    down = opts.label_downsample
    F = maskd_np.shape[0]
    Q = opts.max_quads
    mopts = dataclasses.replace(
        opts.marker,
        min_area_px=opts.marker.min_area_px / (down * down),
        max_candidates=Q)
    quads_b = np.zeros((F, Q, 4, 2), np.float32)
    qvalid = np.zeros((F, Q), bool)
    for f in range(F):
        qs = quads_mod.find_quad_candidates(maskd_np[f], mopts)
        k = min(qs.shape[0], Q)
        if k:
            # Downsampled grid cell (i, j) covers full-res pixels
            # [j*down, (j+1)*down) x [i*down, ...); cell centers map to
            # down * x + (down - 1) / 2.
            quads_b[f, :k] = qs[:k] * down + (down - 1) / 2.0
            qvalid[f, :k] = True
    return quads_b, qvalid


def _host_decode(grids_np: np.ndarray, qvalid: np.ndarray, quads_r: np.ndarray,
                 sub: adict_mod.ArucoDictionary, id_map: np.ndarray,
                 opts: VideoDetectorOptions, n_board_markers: int):
    """Threshold + decode the sampled marker grids; assemble per-frame
    padded marker tensors for the charuco stage.

    Returns (mk_img (F, M, 4, 2), mk_valid (F, M)) with slot m holding the
    image corners of BOARD marker m (M = n_board_markers).
    """
    F, Q = qvalid.shape
    bb = opts.marker.border_bits
    cells = grids_np.shape[-1]
    g = grids_np.reshape(F * Q, cells, cells)
    lo = g.min(axis=(1, 2), keepdims=True)
    hi = g.max(axis=(1, 2), keepdims=True)
    bits = (g > (lo + hi) / 2.0).astype(np.uint8)
    border_mask = np.ones((cells, cells), bool)
    border_mask[bb:-bb, bb:-bb] = False
    border_white = bits[:, border_mask].mean(axis=1)
    inner = bits[:, bb:-bb, bb:-bb]
    ids, rots, _ = adict_mod.decode_bits(inner, sub)
    ok = ((ids >= 0) & (border_white < 0.2)
          & ((hi - lo).reshape(-1) > 20.0) & qvalid.reshape(-1))

    mk_img = np.zeros((F, n_board_markers, 4, 2), np.float32)
    mk_valid = np.zeros((F, n_board_markers), bool)
    qflat = quads_r.reshape(F * Q, 4, 2)
    for k in np.nonzero(ok)[0]:
        f = k // Q
        mid = int(id_map[ids[k]])
        if mk_valid[f, mid]:
            continue  # keep first (largest component) like detect_markers
        mk_img[f, mid] = np.roll(qflat[k], int(rots[k]), axis=0)
        mk_valid[f, mid] = True
    return mk_img, mk_valid


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _block_iter(frames: Iterable[tuple], F: int, prefetch: int) -> Iterator:
    """Group (t, gray) into (times (F,), stack (F,H,W) u8, n_real) blocks,
    decoded on a background thread so decode overlaps device compute."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    _END = object()

    def producer():
        buf_t, buf_f = [], []
        try:
            for t, g in frames:
                buf_t.append(t)
                buf_f.append(np.asarray(g, np.uint8))
                if len(buf_t) == F:
                    q.put((np.asarray(buf_t),
                           np.stack(buf_f), F))
                    buf_t, buf_f = [], []
            if buf_t:
                n = len(buf_t)
                pad = F - n
                buf_f += [buf_f[-1]] * pad
                buf_t += [buf_t[-1]] * pad
                q.put((np.asarray(buf_t), np.stack(buf_f), n))
        finally:
            q.put(_END)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


def detect_charuco_video(frames: Iterable[tuple],
                         spec: "charuco_mod.CharucoBoardSpec",
                         opts: VideoDetectorOptions | None = None):
    """Batched charuco detection over an iterable of (time_s, gray u8).

    Yields (time_s, ids (K,), corners (K, 2)) per input frame, in order.
    """
    opts = opts or VideoDetectorOptions()
    board_mids, board_mcorners = spec.marker_board_corners()
    sub, id_map = adict_mod.subset_dictionary(spec.dictionary, board_mids)
    chess = spec.chessboard_corners()
    M = len(board_mids)
    mk_board1 = board_mcorners.astype(np.float32)  # (M, 4, 2)
    chess_j = jnp.asarray(chess, jnp.float32)
    cells = spec.dictionary.marker_size + 2 * opts.marker.border_bits
    n_loc = min(opts.local_markers, M)

    for times, stack, n_real in _block_iter(frames, opts.batch_frames,
                                            opts.decode_queue):
        F = stack.shape[0]
        gray, maskd, resp = _stage_pixels(
            jnp.asarray(stack), opts.marker.threshold_radius,
            opts.marker.threshold_c, opts.label_downsample,
            6, opts.response_check)
        quads_b, qvalid = _host_quads(np.asarray(maskd), opts)
        quads_r, grids = _stage_markers(gray, jnp.asarray(quads_b),
                                        jnp.asarray(qvalid), cells,
                                        opts.marker.cell_oversample,
                                        opts.marker.subpix_win)
        quads_r_np = np.asarray(quads_r)
        mk_img, mk_valid = _host_decode(np.asarray(grids), qvalid, quads_r_np,
                                        sub, id_map, opts, M)
        mk_board = jnp.broadcast_to(jnp.asarray(mk_board1), (F, M, 4, 2))
        refined, ok = _stage_charuco(
            gray, resp, mk_board, jnp.asarray(mk_img),
            jnp.asarray(mk_valid), chess_j, n_loc, opts.subpix_win,
            opts.min_markers, opts.max_residual_px, opts.response_check)
        refined = np.asarray(refined)
        ok = np.asarray(ok)
        for f in range(n_real):
            ids = np.nonzero(ok[f])[0]
            yield (float(times[f]), ids.astype(np.int64),
                   refined[f, ids].astype(np.float64))
