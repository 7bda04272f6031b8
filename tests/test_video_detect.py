"""Batched video-scale charuco detection vs the single-frame reference path.

The batched pipeline (detect/video.py) restructures the per-frame detector
into per-block device stages; these tests pin it corner-for-corner against
the single-frame detector (detect/charuco.py) and against the render
ground truth (the reference's only detection quality signal is visual,
board_extractor.cc:339-365 — here it is exact)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from openimucameracalibrator_tpu.detect import (aruco_dict, charuco, render,
                                                video)
from openimucameracalibrator_tpu.ops import pnp

DICT = aruco_dict.aruco_original_dictionary(64)


def _homography(src, dst):
    H = np.array(pnp.homography_dlt(jnp.asarray(src[None]),
                                    jnp.asarray(dst[None]),
                                    jnp.ones((1, src.shape[0]))))[0]
    return H / H[2, 2]


def _apply_h(H, pts):
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return ph[:, :2] / ph[:, 2:3]


def _make_frames(n=5, seed=0):
    """n warped views of a rendered charuco board + per-frame GT mapping."""
    spec = charuco.CharucoBoardSpec(10, 8, 0.04, 0.03, DICT)
    img = render.render_charuco_board(DICT, 10, 8, 0.04, 0.03,
                                      px_per_square=60, margin_px=30)
    h0, w0 = img.shape
    rng = np.random.default_rng(seed)
    src = np.float64([[0, 0], [w0, 0], [w0, h0], [0, h0]])
    frames, Hs = [], []
    for k in range(n):
        jitter = rng.uniform(-40, 40, (4, 2))
        dst = np.float64([[50, 40], [w0 - 60, 45],
                          [w0 - 40, h0 - 50], [55, h0 - 35]]) + jitter
        H = _homography(src, dst)
        warped = render.warp_image(img, H, (h0, w0))
        frames.append((0.1 * k, np.asarray(warped, np.uint8)))
        Hs.append(H)
    return spec, frames, Hs


def test_video_detect_matches_single_frame():
    spec, frames, _ = _make_frames(n=5)
    opts = video.VideoDetectorOptions(batch_frames=2)  # forces a tail batch
    got = list(video.detect_charuco_video(iter(frames), spec, opts))
    assert len(got) == len(frames)
    for (t_in, gray), (t_out, ids_b, pts_b) in zip(frames, got):
        assert t_out == t_in
        ids_s, pts_s = charuco.detect_charuco(gray.astype(np.float32), spec)
        # The batched path must find (at least) the single-frame corners;
        # positions agree to a small fraction of a pixel.
        common = np.intersect1d(ids_b, ids_s)
        assert len(common) >= 0.95 * len(ids_s), (len(ids_b), len(ids_s))
        bi = {int(i): k for k, i in enumerate(ids_b)}
        si = {int(i): k for k, i in enumerate(ids_s)}
        d = np.asarray([np.linalg.norm(pts_b[bi[int(c)]] - pts_s[si[int(c)]])
                        for c in common])
        assert d.max() < 0.3, d.max()


def test_video_detect_ground_truth_accuracy():
    spec, frames, Hs = _make_frames(n=4, seed=3)
    got = list(video.detect_charuco_video(
        iter(frames), spec, video.VideoDetectorOptions(batch_frames=4)))
    chess_px = 30.0 + (np.stack([np.arange(63) % 9, np.arange(63) // 9], -1)
                       + 1) * 60.0 - 0.5
    for (t, ids, pts), H in zip(got, Hs):
        assert len(ids) >= 55
        gt = _apply_h(H, chess_px[ids])
        err = np.linalg.norm(pts - gt, axis=1)
        assert err.mean() < 0.25, err.mean()
        assert err.max() < 0.6, err.max()


def test_video_detect_empty_frames():
    """Blank frames yield empty detections, not crashes or fake corners."""
    spec, frames, _ = _make_frames(n=2)
    blank = np.full_like(frames[0][1], 128)
    mixed = [frames[0], (0.5, blank), frames[1]]
    got = list(video.detect_charuco_video(
        iter(mixed), spec, video.VideoDetectorOptions(batch_frames=3)))
    assert len(got) == 3
    assert len(got[0][1]) >= 55
    assert len(got[1][1]) == 0
    assert len(got[2][1]) >= 55


def test_benchmark_block_smoke():
    """Device-resident per-stage benchmark runs and reports sane fields
    (used by the bench to separate compute rate from the tunnel link)."""
    spec, frames, _ = _make_frames(n=4)
    block = np.stack([f[1] for f in frames])
    out = video.benchmark_block(block, spec, n_iters=1)
    assert out["frames_per_block"] == 4
    for k in ("pixels_ms", "host_quads_ms", "decode_interp_ms",
              "device_resident_fps"):
        assert out[k] > 0, (k, out)
