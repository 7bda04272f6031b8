"""Pallas fused corner-response+NMS kernel vs the XLA reference path.

On CPU CI the kernel runs in the Pallas interpreter (bit-faithful to the
kernel semantics); on TPU the compiled kernel runs (exercised by the
detection micro-benchmark in /tmp during perf rounds and by the native
detection path when enabled).
"""

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.detect import image as image_mod
from openimucameracalibrator_tpu.detect import pallas_kernels, render, aruco_dict

INTERPRET = jax.default_backend() != "tpu"


def _board_image():
    d = aruco_dict.aruco_original_dictionary()
    img = render.render_charuco_board(d, 6, 5, 0.04, 0.03, 32, 16)
    return jnp.asarray(img, jnp.float32)


def test_response_matches_xla_reference():
    img = _board_image()
    resp_ref = image_mod.corner_response(img, 6)
    resp_pl, keep = pallas_kernels.corner_response_nms(img, 6, 4,
                                                       interpret=INTERPRET)
    scale = float(jnp.max(jnp.abs(resp_ref))) or 1.0
    np.testing.assert_allclose(np.asarray(resp_pl), np.asarray(resp_ref),
                               atol=2e-5 * scale)
    # NMS mask equals the reduce_window local-max rule.
    k = 2 * 4 + 1
    local_max = jax.lax.reduce_window(resp_ref, -jnp.inf, jax.lax.max,
                                      (k, k), (1, 1), "SAME")
    keep_ref = (resp_ref >= local_max)
    agree = np.mean(np.asarray(keep, bool) == np.asarray(keep_ref))
    # fp tie-breaking at exact-plateau pixels (synthetic render symmetry)
    # can differ; require near-total agreement overall and exact agreement
    # wherever the accept/reject margin is unambiguous.
    assert agree > 0.999, agree
    clear = np.asarray(jnp.abs(resp_ref - local_max) > 1e-4 * scale)
    np.testing.assert_array_equal(np.asarray(keep, bool)[clear],
                                  np.asarray(keep_ref)[clear])


def test_candidates_match_xla_reference():
    rng = np.random.default_rng(0)
    img = _board_image()
    noisy = jnp.asarray(np.asarray(img) + rng.normal(0, 2.0, img.shape),
                        jnp.float32)
    xy_ref, s_ref = image_mod.find_corner_candidates(noisy, max_corners=64)
    xy_pl, s_pl = pallas_kernels.find_corner_candidates_pallas(
        noisy, max_corners=64, interpret=INTERPRET)
    ref = {tuple(p) for p, s in zip(np.asarray(xy_ref), np.asarray(s_ref))
           if s > 0}
    got = {tuple(p) for p, s in zip(np.asarray(xy_pl), np.asarray(s_pl))
           if s > 0}
    # Same candidate set (up to fp plateau ties at the weakest corners).
    inter = len(ref & got)
    assert inter >= 0.95 * max(len(ref), 1), (len(ref), len(got), inter)
