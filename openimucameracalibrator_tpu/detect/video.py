"""Video-scale batched charuco detection.

The reference's detection hot loop is strictly per-frame: one OpenCV
pipeline invocation per video frame over 1-2k-frame recordings
(/root/reference src/core/board_extractor.cc:385-482). This module
re-architects that loop for TPU: frames are processed in fixed-size
blocks, every pixel stage runs as ONE batched device program per block,
and the only per-frame host work left is the irregular connected-
component/quad-graph stage — run on 2x-downsampled masks and overlapped
with video decode on a background thread.

Per F-frame block, exactly TWO device programs and two fetches:

1. ``_stage_pixels``: uint8 frames -> f32 gray + corner-response map
   (both stay device-resident) and the adaptive-threshold dark mask,
   BIT-PACKED on device — the only per-pixel array fetched to host (the
   tunnel-attached v5e downloads at ~7 MB/s; 8x fewer bytes matters).
2. host: per-frame quad candidates from the mask — one labeling + one
   global (label, row) group-by + a fully batched diameter/extreme quad
   fit (quads.find_quad_candidates); padded to a static (F, Q, 4, 2)
   tensor.
3. ``_stage_decode_interp``: ONE fused program — homography cell-grid
   sampling with an ignored cell margin, matmul dictionary decode,
   board-slot assignment, board-aware recovery of undecoded markers
   (refineDetectedMarkers analog), per-corner local-homography charuco
   interpolation, conv-field subpixel refinement, drift/response gates.
   All homographies are least-squares solves (homography_ls), not SVDs.

The block loop is a 2-deep software pipeline (decode thread -> device
pixel stage -> host quad stage -> device fused stage), so host and
device work overlap. Measured on the v5e tunnel client at 960x540 over
a rendered 3.6k-frame recording: 36.9 fps sustained at batch 32 with
60.8/63 corners per frame (OpenCV backend on the same frames: 7.3 fps,
62.8 corners) — against 12 fps / 49.5 corners for the first per-stage
r5 design.

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
    batch_frames: int = 32  # swept on v5e: 16->29.5, 24->33.1, 32->36.9 fps
    max_quads: int = 128         # static quad slots per frame
    # Mask resolution divisor for host labeling. 1 = full resolution:
    # half-res quad corners start ~2 px off, which costs decoded markers
    # on blurred/compressed video (measured 42 vs 60 corners/frame);
    # the vectorized quad stage makes full-res labeling affordable.
    label_downsample: int = 1
    marker: quads_mod.MarkerDetectorOptions = dataclasses.field(
        default_factory=quads_mod.MarkerDetectorOptions)
    min_markers: int = 2
    local_markers: int = 4
    subpix_win: int = 5
    max_residual_px: float = 5.0
    response_check: bool = True
    decode_queue: int = 4        # prefetched frame blocks
    # Board-aware recovery of undecoded markers (refineDetectedMarkers
    # analog; see _stage_decode_interp step 6). err_rate is the accepted
    # bit-error fraction for the fixed-identity verification.
    recover: bool = True
    recover_err_rate: float = 0.25
    # Subpixel-refine marker-quad corners before bit sampling. Off by
    # default: hull corners are within ~1 px at full resolution, which
    # the sampling margin absorbs, and the refinement is the most
    # expensive op of the fused device program (see _stage_decode_interp).
    refine_markers: bool = False


# ---------------------------------------------------------------------------
# Device stages (all shapes static per (F, H, W) configuration)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("radius", "down", "resp_radius",
                                             "want_resp"))
def _stage_pixels(frames_u8, radius: int, c: float, down: int,
                  resp_radius: int, want_resp: bool):
    """(gray_f32 (F,H,W), packed mask (F,H/down,ceil(W/down/8)) uint8,
    resp (F,H,W)).

    The mask is the only per-pixel array fetched to host; it is BIT-
    PACKED on device (np.unpackbits on host) because the device link of
    this client moves bulk data at ~25 MB/s — 8x fewer bytes is ~8x less
    fetch wall."""
    gray = frames_u8.astype(jnp.float32)
    mask = jax.vmap(lambda g: im.adaptive_threshold(g, radius, c))(gray)
    if down > 1:
        maskd = jax.lax.reduce_window(mask, False, jax.lax.bitwise_or,
                                      (1, down, down), (1, down, down),
                                      "VALID")
    else:
        maskd = mask
    F, h, w = maskd.shape
    w8 = (w + 7) // 8 * 8
    mp = jnp.pad(maskd, ((0, 0), (0, 0), (0, w8 - w)))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    packed = (mp.reshape(F, h, w8 // 8, 8).astype(jnp.uint8)
              * weights).sum(-1).astype(jnp.uint8)
    resp = (jax.vmap(lambda g: im._corner_response_xla(g, resp_radius))(gray)
            if want_resp else jnp.zeros((gray.shape[0], 1, 1), jnp.float32))
    return gray, packed, resp


def _unpack_mask(packed_np: np.ndarray, w: int) -> np.ndarray:
    """(F, h, w) bool from the device-packed bitmap."""
    return np.unpackbits(packed_np, axis=-1)[..., :w].astype(bool)


@functools.partial(jax.jit, static_argnames=(
    "cells", "oversample", "win", "max_corr", "n_loc", "ch_win",
    "min_markers", "response_check", "bb", "recover_budget",
    "refine_markers"))
def _stage_decode_interp(gray, resp, quads_b, qvalid, codes, board_corners,
                         chess, cells: int, oversample: int, win: int,
                         max_corr: int, n_loc: int, ch_win: int,
                         min_markers: int, max_residual_px: float,
                         response_check: bool, bb: int = 1,
                         cell_margin: float = 0.13,
                         recover_budget: int = 0,
                         refine_markers: bool = False):
    """ONE device program: quad subpix refine -> homography grid sampling
    -> dictionary decode (matmul Hamming argmin) -> board-slot assignment
    -> per-corner local-homography interpolation + refinement + gates.

    Fusing the decode (previously host numpy between two device programs)
    matters on this client: every host<->device round trip costs the
    ~30 ms tunnel latency, and the video rate at 960x540 was round-trip
    bound (r5 first measurement: 12 fps at 3 programs + 3 fetches per
    16-frame block).

    codes: (4K, B) +-1 subset-dictionary rotation codes (row = r*K + k).
    board_corners: (M, 4, 2) board-frame marker corners, M = K markers.
    chess: (N, 2) chessboard corner positions.
    Returns (refined (F,N,2), ok (F,N), n_markers (F,)).
    """
    F, Q = quads_b.shape[:2]
    K4, B = codes.shape
    K = K4 // 4

    # 1. (optionally) refine quad corners. Marker corners only steer BIT
    # SAMPLING and the chess-corner PREDICTION homographies — both
    # tolerate the ~1 px full-res hull accuracy (the final chess corners
    # get their own subpixel refinement). The refinement is the gather-
    # dominated op of the program (81 window taps x 8 iters x F*Q*4
    # corners), so skipping it roughly halves the fused-stage device time.
    if refine_markers:
        flat = quads_b.reshape(F, Q * 4, 2)
        ref = jax.vmap(lambda g, cs: im.refine_corners_subpix(
            g, cs, win=win))(gray, flat)
        drift = jnp.linalg.norm(ref - flat, axis=-1)
        ref = jnp.where((drift > win + 1.0)[..., None], flat, ref)
        quads_r = ref.reshape(F, Q, 4, 2)
    else:
        quads_r = quads_b.astype(jnp.float32)

    # 2. per-quad homography + cell grid sampling
    src = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]],
                      jnp.float32)
    src_b = jnp.broadcast_to(src, (F, Q, 4, 2))
    Hs = pnp.homography_ls(src_b, quads_r.astype(jnp.float32),
                            jnp.ones((F, Q, 4), jnp.float32))
    Hs = Hs / jnp.where(jnp.abs(Hs[..., 2:3, 2:3]) > 1e-12,
                        Hs[..., 2:3, 2:3], 1.0)
    grids = jax.vmap(lambda g, hs: jax.vmap(
        lambda H: im.sample_homography_grid(g, H, cells, cells, oversample,
                                            cell_margin))(
            hs))(gray, Hs)  # (F, Q, cells, cells)

    # 3. threshold + border/contrast gates
    lo = grids.min(axis=(2, 3))
    hi = grids.max(axis=(2, 3))
    bits = grids > ((lo + hi) / 2.0)[..., None, None]
    border = jnp.ones((cells, cells), bool).at[bb:-bb, bb:-bb].set(False)
    bw = (bits & border).sum(axis=(2, 3)) / border.sum()
    inner = bits[:, :, bb:-bb, bb:-bb]

    # 4. decode: max correlation against all rotations of the code set
    obs_pm = inner.reshape(F, Q, B).astype(jnp.float32) * 2.0 - 1.0
    scores = jnp.einsum("fqb,cb->fqc", obs_pm, codes)  # (F, Q, 4K)
    best = jnp.argmax(scores, axis=-1)
    ham = (B - scores.max(axis=-1).astype(jnp.int32)) // 2
    rot = best // K
    mid = best % K
    dec_ok = (qvalid & (ham <= max_corr) & (bw < 0.2)
              & ((hi - lo) > 20.0))

    # 5. board-slot assignment: largest decoded quad per marker id
    x, y = quads_r[..., 0], quads_r[..., 1]
    area = 0.5 * jnp.abs(
        jnp.sum(x * jnp.roll(y, -1, axis=-1)
                - y * jnp.roll(x, -1, axis=-1), axis=-1))  # (F, Q)
    match = dec_ok[:, :, None] & (mid[:, :, None]
                                  == jnp.arange(K)[None, None, :])
    score = jnp.where(match, area[:, :, None], -1.0)  # (F, Q, K)
    best_q = jnp.argmax(score, axis=1)  # (F, K)
    mk_valid = jnp.any(match, axis=1)   # (F, K)
    # canonical corner order: output j = observed corner (j - rot) mod 4
    sel_q = jax.vmap(lambda qr, b: qr[b])(quads_r, best_q)   # (F, K, 4, 2)
    sel_rot = jax.vmap(lambda r, b: r[b])(rot, best_q)       # (F, K)
    jj = (jnp.arange(4)[None, None, :] - sel_rot[:, :, None]) % 4
    mk_img = jnp.take_along_axis(sel_q, jj[..., None], axis=2)

    mk_board = jnp.broadcast_to(board_corners, (F,) + board_corners.shape)

    # 6. board-aware marker recovery (cv2.aruco.refineDetectedMarkers
    # analog, used by the reference at board_extractor.cc:135-173): fit a
    # global board->image homography from the decoded markers, project
    # every UNDETECTED marker's corners, subpix-refine them, re-sample
    # its bit grid, and accept when it matches THAT marker's code (the
    # identity is fixed by board position and the orientation by the
    # homography, so the relaxed ``recover_budget`` cannot cause a
    # misdecode — it is verification, not search). On real-video frames
    # this recovers the blur/compression decode misses: 28-32 -> ~40 of
    # 40 markers.
    if recover_budget > 0:
        bpa = mk_board.reshape(F, K * 4, 2).astype(jnp.float32)
        ipa = mk_img.reshape(F, K * 4, 2).astype(jnp.float32)
        wa = jnp.repeat(mk_valid, 4, axis=1).astype(jnp.float32)
        Hg = pnp.homography_ls(bpa, ipa, wa)  # (F, 3, 3)
        bh = jnp.concatenate([mk_board, jnp.ones((F, K, 4, 1))],
                             axis=-1).astype(jnp.float32)
        pr = jnp.einsum("fij,fmcj->fmci", Hg, bh)
        wz = pr[..., 2:3]
        proj = pr[..., :2] / jnp.where(jnp.abs(wz) > 1e-9, wz, 1.0)
        h_img, w_img = gray.shape[1:]
        proj_inb = ((proj[..., 0] > 1) & (proj[..., 0] < w_img - 2)
                    & (proj[..., 1] > 1) & (proj[..., 1] < h_img - 2))
        # keep refine windows inside the image for the parked slots
        proj = jnp.clip(proj, 2.0,
                        jnp.asarray([w_img - 3.0, h_img - 3.0], proj.dtype))
        pf = proj.reshape(F, K * 4, 2)
        if refine_markers:
            pref = jax.vmap(lambda g, cs: im.refine_corners_subpix(
                g, cs, win=win))(gray, pf)
            pdrift = jnp.linalg.norm(pref - pf, axis=-1)
            pref = jnp.where((pdrift > win + 1.0)[..., None], pf, pref)
        else:
            pref = pf
        pq = pref.reshape(F, K, 4, 2)
        Hm = pnp.homography_ls(jnp.broadcast_to(src, (F, K, 4, 2)),
                                pq.astype(jnp.float32),
                                jnp.ones((F, K, 4), jnp.float32))
        Hm = Hm / jnp.where(jnp.abs(Hm[..., 2:3, 2:3]) > 1e-12,
                            Hm[..., 2:3, 2:3], 1.0)
        grids2 = jax.vmap(lambda g, hs: jax.vmap(
            lambda H: im.sample_homography_grid(g, H, cells, cells,
                                                oversample, cell_margin))(
                hs))(gray, Hm)  # (F, K, cells, cells)
        lo2 = grids2.min(axis=(2, 3))
        hi2 = grids2.max(axis=(2, 3))
        bits2 = grids2 > ((lo2 + hi2) / 2.0)[..., None, None]
        bw2 = (bits2 & border).sum(axis=(2, 3)) / border.sum()
        pm2 = (bits2[:, :, bb:-bb, bb:-bb].reshape(F, K, B)
               .astype(jnp.float32) * 2.0 - 1.0)
        # rotation-0 code of marker k = codes row 0*K + k.
        score0 = jnp.einsum("fkb,kb->fk", pm2, codes[:K])
        ham0 = (B - score0.astype(jnp.int32)) // 2
        n_dec = mk_valid.sum(-1)
        rec = (~mk_valid & (ham0 <= recover_budget) & (bw2 < 0.3)
               & ((hi2 - lo2) > 20.0) & proj_inb.all(axis=-1)
               & (n_dec >= 2)[:, None])
        mk_img = jnp.where(rec[..., None, None], pq, mk_img)
        mk_valid = mk_valid | rec

    # 7. charuco interpolation (same math as the single-frame path)
    return _charuco_interp(gray, resp, mk_board, mk_img, mk_valid, chess,
                           n_loc, ch_win, min_markers, max_residual_px,
                           response_check) + (mk_valid.sum(-1),)


def _charuco_interp(gray, resp, mk_board, mk_img, mk_valid, chess,
                    n_loc: int, win: int, min_markers: int,
                    max_residual_px: float, response_check: bool):
    """Batched charuco corner interpolation (traced inside the fused
    stage program).

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

    H = pnp.homography_ls(bp.astype(jnp.float32), ip.astype(jnp.float32), w)
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

    # Conv-field subpixel refinement: five MXU convolutions per frame +
    # 5 bilinear taps per corner-iteration, replacing the gather-heavy
    # (2win+1)^2-tap window loop (see im.corner_refine_fields).
    fields = jax.vmap(lambda g: im.corner_refine_fields(g, win))(gray)
    refined = jax.vmap(lambda f, cs: im.refine_corners_from_fields(
        f, cs, win))(fields, pred)
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

    The block loop is a 2-deep software pipeline: while the host runs the
    quad-graph stage for block i, the device already executes the pixel
    stage for block i+1 (JAX async dispatch), and the fused
    decode+interpolation program for block i is dispatched before its
    results are fetched — on a high-latency device link (the ~30 ms
    tunnel round trip of this TPU client) the per-block cost is 2
    programs + 2 fetches instead of the naive 3 + 3, overlapped with
    decode on a background thread.
    """
    opts = opts or VideoDetectorOptions()
    board_mids, board_mcorners = spec.marker_board_corners()
    sub, id_map = adict_mod.subset_dictionary(spec.dictionary, board_mids)
    chess = spec.chessboard_corners()
    order = np.argsort(board_mids)
    codes_j = jnp.asarray(sub.flat_codes())
    # subset decode index k corresponds to original id id_map[k]; board
    # corner table must be in the same (sorted) order.
    board_c = jnp.asarray(board_mcorners[order].astype(np.float32))
    chess_j = jnp.asarray(chess, jnp.float32)
    M = len(board_mids)
    cells = spec.dictionary.marker_size + 2 * opts.marker.border_bits
    n_loc = min(opts.local_markers, M)

    def dispatch_pixels(stack):
        return _stage_pixels(jnp.asarray(stack),
                             opts.marker.threshold_radius,
                             opts.marker.threshold_c,
                             opts.label_downsample, 6, opts.response_check)

    def dispatch_decode(gray, resp, quads_b, qvalid):
        return _stage_decode_interp(
            gray, resp, jnp.asarray(quads_b), jnp.asarray(qvalid), codes_j,
            board_c, chess_j, cells, opts.marker.cell_oversample,
            opts.marker.subpix_win, sub.max_correction_bits, n_loc,
            opts.subpix_win, opts.min_markers, opts.max_residual_px,
            opts.response_check, bb=opts.marker.border_bits,
            cell_margin=opts.marker.cell_margin,
            recover_budget=(int(opts.recover_err_rate
                                * sub.marker_size ** 2)
                            if opts.recover else 0),
            refine_markers=opts.refine_markers)

    def finish(item):
        times, n_real, (refined, ok, _) = item
        refined = np.asarray(refined)
        ok = np.asarray(ok)
        out = []
        for f in range(n_real):
            ids = np.nonzero(ok[f])[0]
            out.append((float(times[f]), ids.astype(np.int64),
                        refined[f, ids].astype(np.float64)))
        return out

    pending_pix = None   # (times, n_real, (gray, maskd, resp))
    pending_out = None   # (times, n_real, (refined, ok, n_mk))
    mask_w = None
    for times, stack, n_real in _block_iter(frames, opts.batch_frames,
                                            opts.decode_queue):
        if mask_w is None:
            mask_w = (stack.shape[2] // opts.label_downsample
                      if opts.label_downsample > 1 else stack.shape[2])
        handles = dispatch_pixels(stack)
        if pending_pix is not None:
            t_p, n_p, (gray_p, maskd_p, resp_p) = pending_pix
            quads_b, qvalid = _host_quads(
                _unpack_mask(np.asarray(maskd_p), mask_w), opts)
            out_h = dispatch_decode(gray_p, resp_p, quads_b, qvalid)
            if pending_out is not None:
                yield from finish(pending_out)
            pending_out = (t_p, n_p, out_h)
        pending_pix = (times, n_real, handles)
    if pending_pix is not None:
        t_p, n_p, (gray_p, maskd_p, resp_p) = pending_pix
        quads_b, qvalid = _host_quads(
                _unpack_mask(np.asarray(maskd_p), mask_w), opts)
        out_h = dispatch_decode(gray_p, resp_p, quads_b, qvalid)
        if pending_out is not None:
            yield from finish(pending_out)
        pending_out = (t_p, n_p, out_h)
    if pending_out is not None:
        yield from finish(pending_out)


def benchmark_block(frames_block: np.ndarray, spec, opts=None, n_iters: int = 5):
    """Per-stage steady-state timings on ONE resident frame block.

    Separates the pipeline's compute capability from the host<->device
    link: on this development client the TPU sits behind a tunnel moving
    ~25 MB/s up / ~7 MB/s down, so the production path (which must upload
    518 KB/frame of decoded video) is TRANSFER-bound at ~35-48 fps at
    960x540 — the math: 0.52 MB up + 0.065 MB (bit-packed mask) down per
    frame is ~28 ms of link time, matching the measured end-to-end rate.
    This helper times the two device programs on a block that is already
    device-resident plus the host quad stage, giving the rate the same
    code achieves when the accelerator is host-attached (PCIe: transfer
    is >100x faster and decode at ~427 fps becomes the cap).

    Returns a dict of per-stage milliseconds for the F-frame block and
    the implied device-side frames/s.
    """
    import time as _time

    opts = opts or VideoDetectorOptions()
    board_mids, board_mcorners = spec.marker_board_corners()
    sub, id_map = adict_mod.subset_dictionary(spec.dictionary, board_mids)
    chess = spec.chessboard_corners()
    order = np.argsort(board_mids)
    codes_j = jnp.asarray(sub.flat_codes())
    board_c = jnp.asarray(board_mcorners[order].astype(np.float32))
    chess_j = jnp.asarray(chess, jnp.float32)
    M = len(board_mids)
    cells = spec.dictionary.marker_size + 2 * opts.marker.border_bits
    n_loc = min(opts.local_markers, M)
    F = frames_block.shape[0]
    mask_w = frames_block.shape[2]

    stack_dev = jnp.asarray(frames_block)        # resident upload, once

    def stage1():
        return _stage_pixels(stack_dev, opts.marker.threshold_radius,
                             opts.marker.threshold_c, opts.label_downsample,
                             6, opts.response_check)

    gray, packed, resp = stage1()
    jax.block_until_ready(packed)
    t0 = _time.perf_counter()
    for _ in range(n_iters):
        out1 = stage1()
        jax.block_until_ready(out1[1])
    t_pix = (_time.perf_counter() - t0) / n_iters

    packed_np = np.asarray(packed)
    t0 = _time.perf_counter()
    for _ in range(n_iters):
        quads_b, qvalid = _host_quads(_unpack_mask(packed_np, mask_w), opts)
    t_quads = (_time.perf_counter() - t0) / n_iters

    qb_dev, qv_dev = jnp.asarray(quads_b), jnp.asarray(qvalid)

    def stage2():
        return _stage_decode_interp(
            gray, resp, qb_dev, qv_dev, codes_j, board_c, chess_j, cells,
            opts.marker.cell_oversample, opts.marker.subpix_win,
            sub.max_correction_bits, n_loc, opts.subpix_win,
            opts.min_markers, opts.max_residual_px, opts.response_check,
            bb=opts.marker.border_bits, cell_margin=opts.marker.cell_margin,
            recover_budget=(int(opts.recover_err_rate * sub.marker_size ** 2)
                            if opts.recover else 0),
            refine_markers=opts.refine_markers)

    out2 = stage2()
    jax.block_until_ready(out2[0])
    t0 = _time.perf_counter()
    for _ in range(n_iters):
        out2 = stage2()
        jax.block_until_ready(out2[0])
    t_dec = (_time.perf_counter() - t0) / n_iters

    # Device stages overlap the host quad stage in the production
    # pipeline, so the steady-state block period is max(host, device).
    block_s = max(t_quads, t_pix + t_dec)
    return {
        "frames_per_block": int(F),
        "pixels_ms": round(t_pix * 1e3, 2),
        "host_quads_ms": round(t_quads * 1e3, 2),
        "decode_interp_ms": round(t_dec * 1e3, 2),
        "device_resident_fps": round(F / block_s, 1),
    }
