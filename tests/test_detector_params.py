"""Detector-parameter config files (reference utils.cc:43-75 schema)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from openimucameracalibrator_tpu.core import board_extractor
from openimucameracalibrator_tpu.detect import (aruco_dict, params, quads,
                                                render)


def quads_mod_default_subpix():
    return quads.MarkerDetectorOptions().subpix_win

OPENCV_YAML = """%YAML:1.0
nmarkers: 1024
adaptiveThreshWinSizeMin: 3
adaptiveThreshWinSizeMax: 23
adaptiveThreshWinSize: 21
adaptiveThreshConstant: 5
minMarkerPerimeterRate: 0.01
maxMarkerPerimeterRate: 2.0
polygonalApproxAccuracyRate: 0.05
cornerRefinementMethod: 1 # 1->subpix 3->apriltag
cornerRefinementWinSize: 6
markerBorderBits: 1
perspectiveRemovePixelPerCell: 21
errorCorrectionRate: 0.6
"""


def test_parse_opencv_yaml_flat(tmp_path):
    p = tmp_path / "params.yml"
    p.write_text(OPENCV_YAML)
    raw = params.parse_opencv_yaml(str(p))
    assert raw["adaptiveThreshWinSize"] == 21
    assert raw["adaptiveThreshConstant"] == 5
    assert raw["cornerRefinementMethod"] == 1  # comment stripped
    assert raw["errorCorrectionRate"] == 0.6


def test_load_detector_params_mapping(tmp_path):
    p = tmp_path / "params.yml"
    p.write_text(OPENCV_YAML)
    dp = params.load_detector_params(str(p), image_size=(960, 540))
    assert dp.marker.threshold_radius == 10  # 21 // 2
    assert dp.marker.threshold_c == 5.0
    assert dp.marker.subpix_win == quads_mod_default_subpix()
    assert dp.charuco.subpix_win == 6
    assert dp.marker.border_bits == 1
    # perimeter rate 0.01 of 960 -> side 2.4 px -> area floor ~5.8 px
    assert 4.0 <= dp.marker.min_area_px < 10.0
    # Nothing silently dropped: unmapped reference keys surface in extras.
    assert "polygonalApproxAccuracyRate" in dp.extras
    assert "errorCorrectionRate" in dp.extras
    assert dp.unknown == {}


def test_params_json_schema(tmp_path):
    p = tmp_path / "params.json"
    p.write_text('{"adaptiveThreshConstant": 9, "cornerRefinementWinSize": 3}')
    dp = params.load_detector_params(str(p))
    assert dp.marker.threshold_c == 9.0
    assert dp.charuco.subpix_win == 3


def test_extract_board_consumes_params_file(tmp_path):
    """The params file steers the live detection path end to end."""
    D = aruco_dict.aruco_original_dictionary(64)
    img = render.render_charuco_board(D, 10, 8, 0.04, 0.03,
                                      px_per_square=60, margin_px=30)
    p = tmp_path / "params.yml"
    p.write_text(OPENCV_YAML)
    opts = board_extractor.BoardExtractorOptions(
        squares_x=10, squares_y=8, detector_params_path=str(p),
        batch_frames=2)
    frames = [(0.0, np.asarray(img, np.uint8)), (0.1, np.asarray(img, np.uint8))]
    ds = board_extractor.extract_board(iter(frames), opts)
    assert ds.valid.sum(1).min() == 63
    # An absurd threshold constant must change behavior (corners vanish).
    p.write_text("%YAML:1.0\nadaptiveThreshConstant: 250\n")
    opts2 = board_extractor.BoardExtractorOptions(
        squares_x=10, squares_y=8, detector_params_path=str(p),
        batch_frames=2)
    ds2 = board_extractor.extract_board(
        iter([(0.0, np.asarray(img, np.uint8))]), opts2)
    assert ds2.valid.sum() == 0
