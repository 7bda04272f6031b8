"""JAX image primitives for target detection.

The pixel-heavy stages of the detector run as jitted array programs
(adaptive threshold, gradients, bilinear sampling, corner response,
subpixel refinement); only the irregular graph stages (component/quads)
stay on host. Replaces the OpenCV calls in the reference's ExtractBoard
(/root/reference src/core/board_extractor.cc:135-243: adaptiveThreshold
inside aruco::detectMarkers, cornerSubPix :160-170).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Detection compute-kernel selection (XLA vs fused Pallas)
#
# The corner-response + NMS stage is the detector's hot loop (reference
# analog: the per-frame OpenCV pipeline in board_extractor.cc:385-482).
# Two implementations exist: the unfused XLA path below and the fused
# Pallas row-band kernel (detect/pallas_kernels.corner_response_nms).
# Measured on a real v5e at 960x540 (bench.py detection stage): the XLA
# path runs at ~12,700 frames/s vs ~1,160 frames/s for the Pallas kernel
# — XLA's MXU convolution + reduce_window beats the roll-based tap loop
# by ~11x, so "auto" resolves to XLA everywhere. The Pallas kernel
# remains selectable (--detector_kernel pallas / OICC_DETECTOR_KERNEL)
# and equality-tested; on CPU it runs in the interpreter.
# ---------------------------------------------------------------------------

_DETECTOR_KERNEL = os.environ.get("OICC_DETECTOR_KERNEL", "auto")


def set_detector_kernel(name: str) -> None:
    """Select the corner-response implementation: 'auto'|'xla'|'pallas'."""
    global _DETECTOR_KERNEL
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown detector kernel {name!r}")
    _DETECTOR_KERNEL = name


def detector_kernel() -> str:
    """The resolved kernel choice ('xla' or 'pallas')."""
    if _DETECTOR_KERNEL == "auto":
        return "xla"  # measured winner on TPU and CPU (see module note)
    return _DETECTOR_KERNEL


# ---------------------------------------------------------------------------
# Filtering / thresholding
# ---------------------------------------------------------------------------

def box_mean(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Local mean over a (2r+1)^2 window with edge-replicated borders.

    Two separable windowed sums (reduce_window) rather than a cumsum
    integral image: on TPU the full-image cumsum lowers to a slow
    sequential scan, while the k-wide windowed sum is a vectorized
    reduction (measured: the batched video pixel stage dropped ~4x)."""
    r = int(radius)
    k = 2 * r + 1
    pad = jnp.pad(img.astype(jnp.float32), r, mode="edge")
    s = jax.lax.reduce_window(pad, 0.0, jax.lax.add, (k, 1), (1, 1), "VALID")
    s = jax.lax.reduce_window(s, 0.0, jax.lax.add, (1, k), (1, 1), "VALID")
    return s / (k * k)


@functools.partial(jax.jit, static_argnames=("radius",))
def adaptive_threshold(img: jnp.ndarray, radius: int = 10, c: float = 7.0):
    """Binary image: 1 where pixel < local_mean - c (dark regions),
    the polarity aruco uses for marker candidates."""
    m = box_mean(img, radius)
    return (img.astype(jnp.float32) < m - c)


def gradients(img: jnp.ndarray):
    """(gx, gy) central-difference gradients, edge-replicated."""
    f = img.astype(jnp.float32)
    fp = jnp.pad(f, 1, mode="edge")
    gx = (fp[1:-1, 2:] - fp[1:-1, :-2]) * 0.5
    gy = (fp[2:, 1:-1] - fp[:-2, 1:-1]) * 0.5
    return gx, gy


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Sample img (H, W) at float pixel coords (u=x, v=y), clamped."""
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return (i00 * (1 - du) * (1 - dv) + i01 * du * (1 - dv)
            + i10 * (1 - du) * dv + i11 * du * dv)


def sample_homography_grid(img: jnp.ndarray, H: jnp.ndarray, nx: int, ny: int,
                           oversample: int = 3, margin: float = 0.0):
    """Mean intensity of an (ny, nx) cell grid mapped by homography H
    (unit square -> image pixels). Each cell is averaged over
    oversample^2 interior samples; ``margin`` ignores that fraction of
    the cell on every side (OpenCV's
    perspectiveRemoveIgnoredMarginPerCell: on blurred/compressed frames
    the cell boundary mixes neighboring bits — measured +4-5 decoded
    markers per real-video frame at margin 0.13). Returns (ny, nx)
    float32."""
    s = oversample
    # cell-interior sample positions in unit coords
    idx = jnp.arange(nx * s)
    cx = (idx // s) / nx + (margin + ((idx % s) + 0.5) / s
                            * (1.0 - 2.0 * margin)) / nx
    idy = jnp.arange(ny * s)
    cy = (idy // s) / ny + (margin + ((idy % s) + 0.5) / s
                            * (1.0 - 2.0 * margin)) / ny
    gx, gy = jnp.meshgrid(cx, cy)
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1) @ H.T
    u = pts[..., 0] / pts[..., 2]
    v = pts[..., 1] / pts[..., 2]
    vals = bilinear_sample(img.astype(jnp.float32), u, v)
    return vals.reshape(ny, s, nx, s).mean(axis=(1, 3))


# ---------------------------------------------------------------------------
# Subpixel corner refinement (cornerSubPix equivalent)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("win", "iters"))
def refine_corners_subpix(img: jnp.ndarray, corners: jnp.ndarray,
                          win: int = 5, iters: int = 8):
    """Gradient-orthogonality subpixel refinement of M corners.

    For the true corner c, every window pixel q satisfies
    grad(q) . (q - c) = 0 (edge pixels: gradient normal to the edge through
    c; flat pixels: zero gradient). Solve the weighted least squares
    A c = b with A = sum w g g^T, b = sum w (g g^T) q per corner, iterated.
    This is exactly OpenCV cornerSubPix's fixed point, batched with vmap.

    corners: (M, 2) float (x, y). Returns (M, 2) refined.
    """
    gx, gy = gradients(img)
    r = int(win)
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                          jnp.arange(-r, r + 1, dtype=jnp.float32), indexing="ij")
    wgt = jnp.exp(-(dx * dx + dy * dy) / (2.0 * (r / 2.0) ** 2)).reshape(-1)
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)

    def step(c):
        u = c[0] + dx
        v = c[1] + dy
        sgx = bilinear_sample(gx, u, v)
        sgy = bilinear_sample(gy, u, v)
        gxx = jnp.sum(wgt * sgx * sgx)
        gxy = jnp.sum(wgt * sgx * sgy)
        gyy = jnp.sum(wgt * sgy * sgy)
        bx = jnp.sum(wgt * (sgx * sgx * u + sgx * sgy * v))
        by = jnp.sum(wgt * (sgx * sgy * u + sgy * sgy * v))
        A = jnp.stack([jnp.stack([gxx, gxy]), jnp.stack([gxy, gyy])])
        b = jnp.stack([bx, by])
        sol = jnp.linalg.solve(A + 1e-9 * jnp.eye(2, dtype=A.dtype), b)
        ok = jnp.isfinite(sol).all() & (jnp.linalg.norm(sol - c) < (r + 1.0))
        return jnp.where(ok, sol, c)

    def body(_, cs):
        return jax.vmap(step)(cs)

    return jax.lax.fori_loop(0, iters, body, corners.astype(jnp.float32))


def corner_refine_fields(img: jnp.ndarray, win: int = 5) -> jnp.ndarray:
    """(H, W, 5) correlation fields for conv-form subpixel refinement.

    :func:`refine_corners_subpix` evaluates, per corner and iteration,
    window sums A(c) = sum_q w(q-c) g g^T and b(c) = sum_q w(q-c) g g^T q
    over ~(2win+1)^2 bilinear taps — a gather-dominated op that dominated
    the batched video detector's device program on TPU (gathers run on
    the scalar pipeline; the tunnel-attached v5e measured ~4 M taps per
    16-frame block). These sums are CROSS-CORRELATIONS of the fields
    (gx^2, gx gy, gy^2, gx^2 x + gx gy y, gx gy x + gy^2 y) with the
    fixed window w — so compute them ONCE per image as five MXU
    convolutions; each refinement iteration then bilinearly samples 5
    field values instead of re-gathering the window
    (:func:`refine_corners_from_fields`). The fixed point differs from
    the exact window recentering only by the bilinear interpolation of
    smooth fields (validated sub-0.05 px on the render round-trip tests).
    """
    gx, gy = gradients(img)
    h, w = img.shape
    X = jnp.arange(w, dtype=jnp.float32)[None, :]
    Y = jnp.arange(h, dtype=jnp.float32)[:, None]
    gxx, gxy, gyy = gx * gx, gx * gy, gy * gy
    f = jnp.stack([gxx, gxy, gyy,
                   gxx * X + gxy * Y,
                   gxy * X + gyy * Y], axis=0)  # (5, H, W)
    r = int(win)
    dy, dx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                         indexing="ij")
    wgt = np.exp(-(dx * dx + dy * dy) / (2.0 * (r / 2.0) ** 2))
    k = jnp.asarray(np.broadcast_to(wgt.astype(np.float32),
                                    (5, 1, 1) + wgt.shape).copy())
    out = jax.lax.conv_general_dilated(
        f[None], k.reshape(5, 1, *wgt.shape), (1, 1), "SAME",
        feature_group_count=5,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    return jnp.moveaxis(out, 0, -1)  # (H, W, 5)


def refine_corners_from_fields(fields: jnp.ndarray, corners: jnp.ndarray,
                               win: int = 5, iters: int = 8) -> jnp.ndarray:
    """Subpixel refinement using precomputed :func:`corner_refine_fields`.

    corners: (M, 2) float (x, y). Returns (M, 2) refined; steps farther
    than win+1 from the current iterate are rejected (same guard as
    refine_corners_subpix)."""
    r = float(win)

    def step(c):
        vals = jax.vmap(lambda ch: bilinear_sample(ch, c[0], c[1]),
                        in_axes=-1)(fields)
        A = jnp.stack([jnp.stack([vals[0], vals[1]]),
                       jnp.stack([vals[1], vals[2]])])
        b = vals[3:5]
        sol = jnp.linalg.solve(A + 1e-9 * jnp.eye(2, dtype=A.dtype), b)
        ok = jnp.isfinite(sol).all() & (jnp.linalg.norm(sol - c) < (r + 1.0))
        return jnp.where(ok, sol, c)

    def body(_, cs):
        return jax.vmap(step)(cs)

    return jax.lax.fori_loop(0, iters, body, corners.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Checkerboard (x-)corner response — Geiger-style prototype correlation
# ---------------------------------------------------------------------------

def _corner_prototype(radius: int, angle: float):
    """Four quadrant kernels (a, b, c, d) of a checkerboard corner prototype
    rotated by ``angle`` (libcbdetect's createCorrelationPatch)."""
    r = radius
    size = 2 * r + 1
    ys, xs = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1), indexing="ij")
    n1 = np.array([-np.sin(angle), np.cos(angle)])
    n2 = np.array([-np.sin(angle + np.pi / 2), np.cos(angle + np.pi / 2)])
    d1 = xs * n1[0] + ys * n1[1]
    d2 = xs * n2[0] + ys * n2[1]
    dist = np.sqrt(xs * xs + ys * ys)
    g = np.exp(-dist ** 2 / (2.0 * (r / 2.0) ** 2))
    a = np.where((d1 <= -0.1) & (d2 <= -0.1), g, 0.0)
    b = np.where((d1 >= 0.1) & (d2 >= 0.1), g, 0.0)
    c = np.where((d1 <= -0.1) & (d2 >= 0.1), g, 0.0)
    d = np.where((d1 >= 0.1) & (d2 <= -0.1), g, 0.0)
    kernels = []
    for k in (a, b, c, d):
        s = k.sum()
        kernels.append((k / s if s > 0 else k).astype(np.float32))
    return np.stack(kernels)  # (4, size, size)


@functools.lru_cache(maxsize=None)
def _prototype_bank(radius: int):
    return np.stack([_corner_prototype(radius, 0.0),
                     _corner_prototype(radius, np.pi / 4)])  # (2, 4, s, s)


def corner_response(img: jnp.ndarray, radius: int = 6):
    """Checkerboard-corner likelihood map (H, W); dispatches to the
    selected kernel (see ``detector_kernel``)."""
    if detector_kernel() == "pallas":
        from openimucameracalibrator_tpu.detect import pallas_kernels
        resp, _ = pallas_kernels.corner_response_nms(
            img, radius, interpret=jax.default_backend() != "tpu")
        return resp
    return _corner_response_xla(img, radius)


@functools.partial(jax.jit, static_argnames=("radius",))
def _corner_response_xla(img: jnp.ndarray, radius: int = 6):
    """XLA reference implementation of the corner-likelihood map.

    For each prototype (axis-aligned and 45 deg): with quadrant means
    a, b (one diagonal) and c, d (other diagonal) and mu = (a+b+c+d)/4,
    response = min(min(a,b) - mu, mu - min(c,d)) and the flipped variant;
    overall response = max over prototypes/flips, clamped at 0
    (Geiger et al. ICRA'12, libcbdetect).
    """
    bank = jnp.asarray(_prototype_bank(radius))  # (2, 4, s, s)
    f = img.astype(jnp.float32)[None, None]  # NCHW
    k = bank.reshape(8, 1, bank.shape[-2], bank.shape[-1])
    out = jax.lax.conv_general_dilated(
        f, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]  # (8, H, W)
    resp = None
    for p in range(2):
        a, b, c, d = out[4 * p], out[4 * p + 1], out[4 * p + 2], out[4 * p + 3]
        mu = 0.25 * (a + b + c + d)
        r1 = jnp.minimum(jnp.minimum(a, b) - mu, mu - jnp.maximum(c, d))
        r2 = jnp.minimum(mu - jnp.maximum(a, b), jnp.minimum(c, d) - mu)
        r = jnp.maximum(r1, r2)
        resp = r if resp is None else jnp.maximum(resp, r)
    return jnp.maximum(resp, 0.0)


def find_corner_candidates(img: jnp.ndarray, max_corners: int = 512,
                           nms_radius: int = 4, rel_threshold: float = 0.05,
                           response_radius: int = 6):
    """Top-K checkerboard corner candidates.

    Returns (xy (K, 2) float32, score (K,)) with score 0 for empty slots.
    NMS: a pixel survives if it equals the local max over the NMS window.
    Dispatches to the fused Pallas kernel when selected (TPU default).
    """
    if detector_kernel() == "pallas":
        from openimucameracalibrator_tpu.detect import pallas_kernels
        return pallas_kernels.find_corner_candidates_pallas(
            img, max_corners=max_corners, nms_radius=nms_radius,
            rel_threshold=rel_threshold, response_radius=response_radius,
            interpret=jax.default_backend() != "tpu")
    return _find_corner_candidates_xla(img, max_corners, nms_radius,
                                       rel_threshold, response_radius)


@functools.partial(jax.jit, static_argnames=("max_corners", "nms_radius",
                                             "response_radius"))
def _find_corner_candidates_xla(img: jnp.ndarray, max_corners: int = 512,
                                nms_radius: int = 4,
                                rel_threshold: float = 0.05,
                                response_radius: int = 6):
    resp = _corner_response_xla(img, response_radius)
    k = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                                      (k, k), (1, 1), "SAME")
    thr = rel_threshold * jnp.max(resp)
    keep = (resp >= local_max) & (resp > thr)
    flat = jnp.where(keep, resp, 0.0).reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_corners)
    w = img.shape[1]
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), scores
