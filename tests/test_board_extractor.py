"""Native detection round-trips: render targets, warp them into views,
detect, verify ids + subpixel positions against the warp homography.

Mirrors the reference's only quality signal for detection (visual
inspection, board_extractor.cc:339-365) with exact closed-loop asserts.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from openimucameracalibrator_tpu.core import board_extractor
from openimucameracalibrator_tpu.detect import (aruco_dict, charuco,
                                                checkerboard, quads, render)
from openimucameracalibrator_tpu.models import boards
from openimucameracalibrator_tpu.ops import pnp


def _homography(src, dst):
    import jax.numpy as jnp
    H = np.array(pnp.homography_dlt(jnp.asarray(src[None]), jnp.asarray(dst[None]),
                                    jnp.ones((1, src.shape[0]))))[0]
    return H / H[2, 2]


def _apply_h(H, pts):
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return ph[:, :2] / ph[:, 2:3]


DICT = aruco_dict.aruco_original_dictionary(64)


def test_aruco_original_encoding():
    # row code table self-consistency: id bits recoverable from the grid
    bits = aruco_dict.aruco_original_marker_bits(777)
    rows = {tuple(p): d for d, p in enumerate(
        [[1, 0, 0, 0, 0], [1, 0, 1, 1, 1], [0, 1, 0, 0, 1], [0, 1, 1, 1, 0]])}
    got = 0
    for i in range(5):
        got = (got << 2) | rows[tuple(bits[i])]
    assert got == 777


def test_dictionary_decode_rotations_and_errors():
    bits = DICT.bits[:16]
    for r in range(4):
        rot = np.stack([np.rot90(b, r) for b in bits])
        ids, rots, ham = aruco_dict.decode_bits(rot, DICT)
        np.testing.assert_array_equal(ids, np.arange(16))
        assert (rots == r).all()
        assert (ham == 0).all()
    # flip up to max_correction_bits bits -> still decodes
    noisy = bits.copy()
    noisy[:, 0, 0] ^= 1
    ids, _, ham = aruco_dict.decode_bits(noisy, DICT)
    np.testing.assert_array_equal(ids, np.arange(16))
    assert (ham == 1).all()


def test_marker_detection_subpixel():
    img = render.render_marker(DICT, 23, 80)
    big = np.full((240, 260), 255, np.uint8)
    big[70:150, 90:170] = img
    ids, corners = quads.detect_markers(big.astype(np.float32), DICT)
    assert list(ids) == [23]
    want = np.array([[89.5, 69.5], [169.5, 69.5], [169.5, 149.5], [89.5, 149.5]])
    np.testing.assert_allclose(corners[0], want, atol=0.25)


def test_marker_detection_canonical_rotation():
    img = render.render_marker(DICT, 23, 80)
    for r in range(4):
        big = np.full((240, 260), 255, np.uint8)
        big[70:150, 90:170] = np.rot90(img, r)
        ids, corners = quads.detect_markers(big.astype(np.float32), DICT)
        assert list(ids) == [23], f"rotation {r}"
        # canonical TL corner must track the rotated placement: canonical
        # corner c sits at placed-image corner (c - r) mod 4
        placed = np.array([[89.5, 69.5], [169.5, 69.5], [169.5, 149.5], [89.5, 149.5]])
        want_tl = placed[(0 - r) % 4]
        np.testing.assert_allclose(corners[0][0], want_tl, atol=0.25)


def test_charuco_render_detect_roundtrip():
    spec = charuco.CharucoBoardSpec(10, 8, 0.04, 0.03, DICT)
    img = render.render_charuco_board(DICT, 10, 8, 0.04, 0.03,
                                      px_per_square=60, margin_px=30)
    ids, pts = charuco.detect_charuco(img.astype(np.float32), spec)
    assert len(ids) == 63
    # physical corner edges sit at margin + (k+1)*pps - 0.5 (pixel centers)
    want = 30.0 + (np.stack([ids % 9, ids // 9], -1) + 1) * 60.0 - 0.5
    err = np.linalg.norm(pts - want, axis=1)
    assert err.max() < 0.25


def test_charuco_detection_under_homography():
    spec = charuco.CharucoBoardSpec(10, 8, 0.04, 0.03, DICT)
    img = render.render_charuco_board(DICT, 10, 8, 0.04, 0.03,
                                      px_per_square=60, margin_px=30)
    h0, w0 = img.shape
    src = np.float64([[0, 0], [w0, 0], [w0, h0], [0, h0]])
    dst = np.float64([[40, 30], [w0 - 70, 50], [w0 - 30, h0 - 40], [60, h0 - 20]])
    H = _homography(src, dst)
    warped = render.warp_image(img, H, (h0, w0))
    ids, pts = charuco.detect_charuco(warped.astype(np.float32), spec)
    assert len(ids) >= 55
    gt0 = 30.0 + (np.stack([ids % 9, ids // 9], -1) + 1) * 60.0 - 0.5
    err = np.linalg.norm(pts - _apply_h(H, gt0), axis=1)
    assert err.mean() < 0.2
    assert err.max() < 0.5


def test_checkerboard_full_grid():
    img = render.render_checkerboard(8, 6, px_per_square=50, margin_px=25)
    ids, pts = checkerboard.detect_checkerboard(img.astype(np.float32), 8, 6)
    assert len(ids) == 35
    want = 25.0 + (np.stack([ids % 7, ids // 7], -1) + 1) * 50.0 - 0.5
    err = np.linalg.norm(pts - want, axis=1)
    assert err.max() < 0.2


def test_checkerboard_under_homography():
    img = render.render_checkerboard(8, 6, px_per_square=50, margin_px=25)
    h0, w0 = img.shape
    src = np.float64([[0, 0], [w0, 0], [w0, h0], [0, h0]])
    dst = np.float64([[30, 20], [w0 - 50, 40], [w0 - 20, h0 - 30], [45, h0 - 15]])
    H = _homography(src, dst)
    warped = render.warp_image(img, H, (h0, w0))
    ids, pts = checkerboard.detect_checkerboard(warped.astype(np.float32), 8, 6)
    assert len(ids) == 35
    gt0 = 25.0 + (np.stack([ids % 7, ids // 7], -1) + 1) * 50.0 - 0.5
    err = np.linalg.norm(pts - _apply_h(H, gt0), axis=1)
    assert err.mean() < 0.25


def test_extract_board_dataset_assembly():
    opts = board_extractor.BoardExtractorOptions(squares_x=10, squares_y=8,
                                                 backend="native")
    img = render.render_charuco_board(DICT, 10, 8, 0.04, 0.03,
                                      px_per_square=60, margin_px=30)
    # Native default dictionary is the full 1024-marker set; detection of a
    # 64-marker render still works because ids < 64 decode identically.
    frames = [(0.0, img), (0.1, img)]
    ds = board_extractor.extract_board(frames, opts, fps=10.0)
    assert ds.points2d.shape == (2, 63, 2)
    assert ds.valid.sum() == 2 * 63
    assert ds.image_size == (img.shape[1], img.shape[0])
    board = boards.charuco_board(10, 8, 0.04, 0.03)
    np.testing.assert_allclose(ds.board_points, board.points)


def test_aprilgrid_native_roundtrip():
    d = aruco_dict.random_dictionary(8, marker_size=6, seed=3)
    img = render.render_aprilgrid(d, 3, 2, tag_px=80, spacing_ratio=0.3,
                                  margin_px=30)
    opts = board_extractor.BoardExtractorOptions(
        board_type="apriltag", squares_x=3, squares_y=2,
        square_length=0.088, marker_length=0.3, backend="native",
        dictionary=d)
    detect = board_extractor.make_native_detector(opts)
    ids, pts = detect(img.astype(np.float32))
    assert len(ids) == 3 * 2 * 4
    # tag 0 corner 0 = board (0,0) -> image bottom-left area (+y board = up)
    k = list(ids).index(0)
    h0 = img.shape[0]
    assert pts[k][1] > h0 / 2


def test_render_board_image_app_path(tmp_path):
    opts = board_extractor.BoardExtractorOptions(squares_x=6, squares_y=5)
    img = board_extractor.render_charuco_board_image(opts, px_per_square=40,
                                                     margin_px=10)
    assert img.shape == (5 * 40 + 20, 6 * 40 + 20)
    out = tmp_path / "board.png"
    board_extractor.save_image(str(out), img)
    back = board_extractor.load_gray_image(str(out))
    np.testing.assert_array_equal(back, img)


def test_tag36h11_matches_opencv_bits():
    """Embedded 36h11 table is bit-exact vs cv2.aruco.DICT_APRILTAG_36h11."""
    cv2 = pytest.importorskip("cv2")
    d = aruco_dict.tag36h11_dictionary()
    assert d.num_markers == 587 and d.marker_size == 6
    ref = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    img = np.zeros((8, 8), np.uint8)
    for k in [0, 1, 7, 42, 300, 586]:
        cv2.aruco.generateImageMarker(ref, k, 8, img, 1)
        inner = (img[1:7, 1:7] > 127).astype(np.uint8)
        np.testing.assert_array_equal(d.bits[k], inner)


def test_tag36h11_native_detects_opencv_rendered_grid():
    """Cross-tool parity: native detector reads a cv2-rendered aprilgrid."""
    cv2 = pytest.importorskip("cv2")
    ref = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    tag_px, gap, margin = 80, 24, 30
    tags_x, tags_y = 3, 2
    pitch = tag_px + gap
    H = tags_y * pitch - gap + 2 * margin
    W = tags_x * pitch - gap + 2 * margin
    img = np.full((H, W), 255, np.uint8)
    m = np.zeros((tag_px, tag_px), np.uint8)
    for ty in range(tags_y):
        for tx in range(tags_x):
            t = ty * tags_x + tx
            cv2.aruco.generateImageMarker(ref, t, tag_px, m, 1)
            y0 = margin + (tags_y - 1 - ty) * pitch
            x0 = margin + tx * pitch
            img[y0:y0 + tag_px, x0:x0 + tag_px] = m
    opts = board_extractor.BoardExtractorOptions(
        board_type="apriltag", squares_x=tags_x, squares_y=tags_y,
        backend="native")
    detect = board_extractor.make_native_detector(opts)
    ids, pts = detect(img.astype(np.float32))
    assert len(ids) == tags_x * tags_y * 4


def test_tag36h11_opencv_detects_native_rendered_grid():
    """And the reverse: cv2 detector reads our natively rendered grid."""
    cv2 = pytest.importorskip("cv2")
    d = aruco_dict.tag36h11_dictionary()
    img = render.render_aprilgrid(d, 3, 2, tag_px=80, spacing_ratio=0.3,
                                  margin_px=30)
    adict = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    det = cv2.aruco.ArucoDetector(adict, cv2.aruco.DetectorParameters())
    corners, ids, _ = det.detectMarkers(img)
    assert ids is not None and sorted(ids.reshape(-1).tolist()) == [0, 1, 2, 3, 4, 5]


def test_subset_dictionary_raises_distance_and_maps_ids():
    """Board-subset decoding (aruco_dict.subset_dictionary): the subset's
    correction budget derives from its true rotation-aware minimum
    Hamming distance, id_map round-trips to original ids, and a bit
    pattern that decodes to a NON-board id under the full dictionary is
    rejected by the subset (the misdecode class that shifted corner
    neighborhoods by one square on 960x540 fixtures)."""
    from openimucameracalibrator_tpu.detect import aruco_dict as ad

    d = ad.aruco_original_dictionary()
    ids = np.arange(40)
    sub, id_map = ad.subset_dictionary(d, ids)
    assert sub.num_markers == 40
    np.testing.assert_array_equal(id_map, ids)
    assert 0 <= sub.max_correction_bits <= d.max_correction_bits

    # Decode a board marker through the subset: maps back to itself.
    bits = d.bits[7]
    got_ids, rots, ham = ad.decode_bits(bits[None], sub)
    assert got_ids[0] >= 0 and int(id_map[got_ids[0]]) == 7 and ham[0] == 0

    # A marker OUTSIDE the subset must not decode as a board marker
    # unless it happens to sit within the correction budget of one.
    outside = d.bits[500]
    got_ids, _, ham = ad.decode_bits(outside[None], sub)
    assert got_ids[0] == -1 or ham[0] <= sub.max_correction_bits
