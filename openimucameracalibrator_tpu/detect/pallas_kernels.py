"""Pallas TPU kernel: fused checkerboard corner response + NMS.

The XLA path (detect/image.py corner_response + find_corner_candidates)
runs an 8-kernel 13x13 correlation, three elementwise reduction passes and
a reduce_window NMS — each stage round-trips the response map through HBM.
This kernel fuses the whole stencil pipeline: the padded frame stays in
HBM (``memory_space=ANY``), each grid step DMAs one row-band + halo into
VMEM (``make_async_copy`` + semaphore), evaluates the 8 quadrant
correlations as ``pltpu.roll`` shifted FMAs into VMEM scratch accumulators
(nonzero taps only — the quadrant masks zero ~3/4 of each 13x13 kernel),
applies the response reduction and a separable (2n+1)^2 NMS on the
resident band, and writes response + local-max mask. HBM is touched once
per input pixel and once per output pixel.

Design notes (learned against Mosaic): value slices at unaligned sublane
offsets and long unrolled SSA chains make the compiler materialize every
shifted copy (a whole-image single-program version peaked at 277 MB of
VMEM); rolls + scratch-ref accumulation + row-band tiling keep the live
set to a few band-sized buffers. ``dynamic_update_slice`` and
sublane-unaligned ``concatenate`` do not lower; ``pltpu.roll`` (shuffle),
``broadcasted_iota`` and ``where`` do.

Replaces the OpenCV corner-detector role of the reference
(/root/reference src/core/board_extractor.cc:135-206) on the TPU path;
equality with the XLA implementation is pinned by
tests/test_pallas_detect.py (interpreter mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openimucameracalibrator_tpu.detect import image as image_mod


def _tap_tables(radius: int):
    """(dys, dxs, ws) each (8, Kmax): nonzero taps of the 8 quadrant
    kernels (2 prototypes x 4 quadrants), zero-weight padded to a common
    length so the kernel's tap loop has one static trip count."""
    bank = image_mod._prototype_bank(radius)  # (2, 4, s, s)
    quads = []
    for p in range(2):
        for q in range(4):
            k = bank[p, q]
            ys, xs = np.nonzero(k)
            quads.append([(int(y), int(x), float(k[y, x]))
                          for y, x in zip(ys, xs)])
    kmax = max(len(q) for q in quads)
    dys = np.zeros((8, kmax), np.int32)
    dxs = np.zeros((8, kmax), np.int32)
    ws = np.zeros((8, kmax), np.float32)
    for i, q in enumerate(quads):
        for j, (dy, dx, w) in enumerate(q):
            dys[i, j], dxs[i, j], ws[i, j] = dy, dx, w
    return dys, dxs, ws


def _make_kernel(H: int, W: int, Wp: int, T: int, radius: int,
                 nms_radius: int, kmax: int, dtype):
    r, n = radius, nms_radius
    Text = T + 2 * n          # response band incl. NMS halo
    # input band incl. conv + NMS halo, rounded to the 8-row sublane tile
    # (Mosaic requires DMA slice extents aligned to the tiling).
    Tin = ((T + 2 * (r + n) + 7) // 8) * 8

    def kernel(dys, dxs, ws, img_hbm, resp_ref, keep_ref, tile, acc, sem):
        i = pl.program_id(0)
        # DMA this band (+halo) from HBM; the host pads rows by r+n and
        # cols by r (tile-aligned), so every band's halo exists.
        cp = pltpu.make_async_copy(img_hbm.at[pl.ds(i * T, Tin)], tile, sem)
        cp.start()
        cp.wait()
        fp = tile[:]

        # Quadrant correlations: a fori_loop over SMEM tap tables with
        # DYNAMIC pltpu.roll shifts — one live accumulator instead of an
        # unrolled SSA chain (which made Mosaic stack-allocate every
        # shifted copy: 52-277 MB of VMEM in earlier designs). Roll
        # wrap-around only contaminates coordinates the consumer
        # (rows < Text <= Tin - 2r, cols < W <= Wp - 2r) never reads.
        def quad_sum(qi):
            def body(k, s):
                dy = dys[qi, k]
                dx = dxs[qi, k]
                w = ws[qi, k]
                rolled = pltpu.roll(fp, (Tin - dy) % Tin, 0)
                rolled = pltpu.roll(rolled, (Wp - dx) % Wp, 1)
                return s + w * rolled[:Text, :W]

            return jax.lax.fori_loop(0, kmax, body,
                                     jnp.zeros((Text, W), dtype))

        resp = None
        for p in range(2):  # 2 prototypes
            for q in range(4):
                acc[q] = quad_sum(4 * p + q)
            a, b, c, d = acc[0], acc[1], acc[2], acc[3]
            mu = dtype(0.25) * (a + b + c + d)
            r1 = jnp.minimum(jnp.minimum(a, b) - mu, mu - jnp.maximum(c, d))
            r2 = jnp.minimum(mu - jnp.maximum(a, b), jnp.minimum(c, d) - mu)
            rr = jnp.maximum(r1, r2)
            resp = rr if resp is None else jnp.maximum(resp, rr)
        resp = jnp.maximum(resp, dtype(0.0))

        # Rows outside the true image (top/bottom pad bands + the H->T
        # round-up) must not win the NMS: mask them to -inf.
        neg = dtype(np.finfo(np.float32).min)
        gy = jax.lax.broadcasted_iota(jnp.int32, (Text, W), 0) \
            + i * T - n  # global image row of each resp_ext row
        re = jnp.where((gy >= 0) & (gy < H), resp, neg)

        # Separable NMS: columns via roll+mask, rows via static slices of
        # the haloed band.
        col = jax.lax.broadcasted_iota(jnp.int32, (Text, W), 1)
        rowmax = re
        for dx in range(-n, n + 1):
            if dx:
                s = pltpu.roll(re, (-dx) % W, 1)
                valid = (col + dx >= 0) & (col + dx < W)
                rowmax = jnp.maximum(rowmax, jnp.where(valid, s, neg))
        localmax = rowmax[n:n + T, :]
        for dy in range(-n, n + 1):
            if dy:
                localmax = jnp.maximum(localmax, rowmax[n + dy:n + dy + T, :])

        out_resp = jnp.maximum(re[n:n + T, :], dtype(0.0))  # undo -inf mask
        resp_ref[:] = out_resp
        keep_ref[:] = (re[n:n + T, :] >= localmax).astype(dtype)

    return kernel


class _AccSlots(list):
    """Mutable 4-slot accumulator view over one VMEM scratch ref."""

    def __init__(self, ref):
        super().__init__([None] * 4)
        self._ref = ref

    def __setitem__(self, q, val):
        self._ref[q] = val
        super().__setitem__(q, self._ref[q])


@functools.partial(jax.jit, static_argnames=("radius", "nms_radius",
                                             "interpret"))
def corner_response_nms(img: jnp.ndarray, radius: int = 6,
                        nms_radius: int = 4, interpret: bool = False):
    """(resp (H, W) f32, is_local_max (H, W) f32) in one fused pass.

    ``interpret=True`` runs the Pallas interpreter (CPU tests); on TPU the
    compiled kernel executes. Numerically identical to
    image.corner_response + the reduce_window local-max of
    image.find_corner_candidates (pinned by tests/test_pallas_detect.py).
    """
    H, W = img.shape
    dtype = jnp.float32
    r, n = radius, nms_radius
    T = min(128, max(8, ((H + 7) // 8) * 8))  # row-band height
    Hpad = ((H + T - 1) // T) * T
    Tin = ((T + 2 * (r + n) + 7) // 8) * 8
    bot_pad = (Tin - T - (r + n)) + (Hpad - H)  # last band's DMA in range
    # Lane dim of the DMA slice must align to the 128-lane tile.
    Wp = ((W + 2 * r + 127) // 128) * 128
    # Zero padding — exactly the XLA conv's SAME zero-padding semantics.
    f = jnp.pad(img.astype(dtype),
                ((r + n, bot_pad), (r, Wp - W - r)), mode="constant")
    dys, dxs, ws = _tap_tables(radius)
    Text = T + 2 * n

    inner = _make_kernel(H, W, Wp, T, r, n, dys.shape[1], dtype)

    def kernel(dys_ref, dxs_ref, ws_ref, img_hbm, resp_ref, keep_ref,
               tile, accs, sem):
        inner(dys_ref, dxs_ref, ws_ref, img_hbm, resp_ref, keep_ref,
              tile, _AccSlots(accs), sem)

    resp, keep = pl.pallas_call(
        kernel,
        grid=(Hpad // T,),
        out_shape=(jax.ShapeDtypeStruct((Hpad, W), dtype),
                   jax.ShapeDtypeStruct((Hpad, W), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((T, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((T, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((Tin, Wp), dtype),
                        pltpu.VMEM((4, Text, W), dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(jnp.asarray(dys), jnp.asarray(dxs), jnp.asarray(ws), f)
    return resp[:H], keep[:H]


def find_corner_candidates_pallas(img: jnp.ndarray, max_corners: int = 512,
                                  nms_radius: int = 4,
                                  rel_threshold: float = 0.05,
                                  response_radius: int = 6,
                                  interpret: bool = False):
    """Drop-in for image.find_corner_candidates using the fused kernel."""
    resp, keep = corner_response_nms(img, response_radius, nms_radius,
                                     interpret=interpret)
    thr = rel_threshold * jnp.max(resp)
    flat = jnp.where((keep > 0) & (resp > thr), resp, 0.0).reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_corners)
    w = img.shape[1]
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), scores
