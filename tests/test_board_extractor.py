"""Board detection round-trip: render a charuco board, warp it into views,
detect corners, verify ids+subpixel positions against the homography."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from openimucameracalibrator_tpu.core import board_extractor
from openimucameracalibrator_tpu.models import boards


def test_charuco_render_detect_roundtrip():
    opts = board_extractor.BoardExtractorOptions(
        squares_x=10, squares_y=8, square_length=0.04, marker_length=0.03)
    img = board_extractor.render_charuco_board_image(opts, px_per_square=60,
                                                     margin_px=30)
    assert img.shape[0] > 400 and img.shape[1] > 500

    board = boards.charuco_board(10, 8, 0.04, 0.03)
    # Direct (unwarped) detection.
    det, _ = board_extractor._make_charuco_detector(opts)
    ids, pts = board_extractor.detect_charuco(img, det)
    assert len(ids) == board.num_points  # all 63 inner corners found
    # Corner k of the board grid maps to a known pixel position: square
    # length = 60 px, margin 30 px.
    want = 30.0 + board.points[ids][:, :2] / 0.04 * 60.0
    np.testing.assert_allclose(pts, want, atol=1.0)


def test_charuco_detection_under_homography():
    opts = board_extractor.BoardExtractorOptions(squares_x=10, squares_y=8)
    img = board_extractor.render_charuco_board_image(opts, px_per_square=60,
                                                     margin_px=30)
    h0, w0 = img.shape[:2]
    # Mild perspective warp.
    src = np.float32([[0, 0], [w0, 0], [w0, h0], [0, h0]])
    dst = np.float32([[40, 30], [w0 - 70, 50], [w0 - 30, h0 - 40], [60, h0 - 20]])
    H = cv2.getPerspectiveTransform(src, dst)
    warped = cv2.warpPerspective(img, H, (w0, h0), borderValue=255)

    frames = [(0.0, img), (0.1, warped)]
    ds = board_extractor.extract_board(frames, opts, fps=10.0)
    assert ds.num_views == 2
    assert ds.valid[0].sum() == 63
    assert ds.valid[1].sum() > 50
    # Warped detections must match the homography-mapped originals.
    both = ds.valid[0] & ds.valid[1]
    p0 = ds.points2d[0][both]
    p1 = ds.points2d[1][both]
    ph = cv2.perspectiveTransform(p0.reshape(-1, 1, 2), H).reshape(-1, 2)
    np.testing.assert_allclose(p1, ph, atol=1.2)


def test_radon_board_detection():
    opts = board_extractor.BoardExtractorOptions(board_type="radon",
                                                squares_x=8, squares_y=6)
    # Render a plain checkerboard.
    sq = 50
    nx, ny = 8, 6
    img = np.full((ny * sq + 100, nx * sq + 100), 255, np.uint8)
    for y in range(ny):
        for x in range(nx):
            if (x + y) % 2 == 0:
                img[50 + y * sq:50 + (y + 1) * sq, 50 + x * sq:50 + (x + 1) * sq] = 0
    ds = board_extractor.extract_board([(0.0, img)], opts, fps=1.0)
    assert ds.valid[0].sum() == (nx - 1) * (ny - 1)
