"""Fused densify+Gram Pallas kernel for the chunk linearizer.

The XLA path (core/spline_estimator.py ``_densify_segments`` + ``_gram``)
materializes every chunk's densified Jacobian ``Jd (C*rd, L)`` in HBM
between the one-hot placement einsum and the Gram matmul: at DS3 bench
scale that is ~56 chunks x 8192 x ~190 x 4 B of write+read traffic per
linearize, and the r4 v5e profile attributed 11.4 ms of the 35 ms device
time to layout ``copy`` ops around exactly these buffers (the Gram itself
was 4.6 ms). This kernel fuses the two steps: each row tile's dense
Jacobian is BUILT IN VMEM with predicated lane selects (never leaves the
chip) and immediately contracted on the MXU into the (L, L) Gram
accumulator, so the only HBM traffic is the compact ``J (R, F)`` read and
one ``(L, L)`` write.

The placement structure mirrors ``_densify_segments`` (reference role:
the block-sparse Jacobian layout Ceres builds implicitly from parameter
blocks, spline_trajectory_estimator.impl.h:254-276): a static list of

* ``("run", col0, nblk, td, wblk, out_off)`` — ``nblk`` contiguous
  td-wide blocks of the compact Jacobian land at block position
  ``idx[row] + k`` of a ``wblk``-block region starting at ``out_off``
  (per-row ``idx`` passed as a tensor); and
* ``("fixed", col0, ncols, out_off)`` — columns shared by all rows.

Used via :func:`make_fused_gram`; the call is vmap-compatible (the chunk
axis of the linearizer becomes a leading Pallas grid dimension).
Equality against the XLA densify+Gram path is tested in
tests/test_pallas_gram.py; the TPU win is measured by the bench
``breakdown`` stage (``gram_kernel`` option).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def make_fused_gram(segments, L: int, R: int, F: int, tile_rows: int = 512,
                    interpret: bool = False):
    """Build ``fused(J (R, F), r (R,), *idx arrays (R,) int32) -> (H, g)``.

    ``segments`` is the static placement list (see module docstring); one
    ``(R,)`` int32 block-index array must be passed per "run" segment, in
    segment order. ``H`` is ``(L, L)``, ``g`` is ``(L,)``, both float32.

    The returned function carries a ``custom_vmap`` rule: the linearizer
    vmaps it over the chunk axis, and the default pallas batching rule
    materializes the FULL batched operands and outputs in VMEM (measured
    21.2 MB > the 16 MB scoped limit at DS3 scale — a hard compile
    error). The rule instead folds the batch axis into the kernel grid:
    grid ``(K, n_tiles)``, one (tile, chunk) block resident at a time,
    output block revisited across the inner tile axis (TPU grids iterate
    the last axis innermost, so the accumulate-then-move-on pattern
    holds per chunk)."""
    T = min(tile_rows, _round_up(R, 8))
    Rp = _round_up(R, T)
    n_tiles = Rp // T
    Lp = _round_up(L, 128)
    n_run = sum(1 for s in segments if s[0] == "run")

    def kernel(jref, rref, *refs):
        idx_refs = refs[:n_run]
        href, gref = refs[n_run], refs[n_run + 1]
        jt = jref[0]                      # (T, F)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, Lp), 1)
        dense = jnp.zeros((T, Lp), jnp.float32)
        run_i = 0
        for seg in segments:
            if seg[0] == "run":
                _, col0, nblk, td, wblk, out_off = seg
                idx = idx_refs[run_i][0]  # (T, 1) int32
                run_i += 1
                for k in range(nblk):
                    base = (idx + k) * td + out_off   # (T, 1)
                    for c in range(td):
                        dense = dense + jnp.where(
                            cols == base + c,
                            jt[:, col0 + k * td + c][:, None], 0.0)
            else:
                _, col0, ncols, out_off = seg
                for c in range(ncols):
                    dense = dense + jnp.where(
                        cols == out_off + c,
                        jt[:, col0 + c][:, None], 0.0)
        ht = jax.lax.dot_general(dense, dense, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        gt = jax.lax.dot_general(rref[0], dense, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _():
            href[0] = ht
            gref[0] = gt

        @pl.when(pl.program_id(1) != 0)
        def _():
            href[0] += ht
            gref[0] += gt

    def batched_call(K: int):
        row_spec = pl.BlockSpec((1, T, F), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        col1_spec = pl.BlockSpec((1, T, 1), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((1, Lp, Lp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(K, n_tiles),
            in_specs=[row_spec, col1_spec] + [col1_spec] * n_run,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((K, Lp, Lp), jnp.float32),
                       jax.ShapeDtypeStruct((K, 1, Lp), jnp.float32)],
            interpret=interpret,
        )

    def _prep(J, r, idxs):
        pad = Rp - R
        Jp = jnp.pad(J.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
        rp = jnp.pad(r.astype(jnp.float32), ((0, 0), (0, pad)))[..., None]
        ip = [jnp.pad(i.astype(jnp.int32), ((0, 0), (0, pad)))[..., None]
              for i in idxs]
        return Jp, rp, ip

    @jax.custom_batching.custom_vmap
    def fused(J, r, *idxs):
        assert J.shape == (R, F), (J.shape, (R, F))
        assert len(idxs) == n_run, (len(idxs), n_run)
        Jp, rp, ip = _prep(J[None], r[None], [i[None] for i in idxs])
        H, g = batched_call(1)(Jp, rp, *ip)
        return H[0, :L, :L], g[0, 0, :L]

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, J, r, *idxs):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        J = bc(J, in_batched[0])
        r = bc(r, in_batched[1])
        idxs = [bc(i, b) for i, b in zip(idxs, in_batched[2:])]
        Jp, rp, ip = _prep(J, r, idxs)
        H, g = batched_call(axis_size)(Jp, rp, *ip)
        return (H[:, :L, :L], g[:, 0, :L]), (True, True)

    return fused


@functools.partial(jax.jit, static_argnames=("segments", "L", "interpret"))
def fused_gram(J, r, idxs, segments, L: int, interpret: bool = False):
    """One-shot convenience wrapper (jits per (segments, shapes))."""
    R, F = J.shape
    return make_fused_gram(segments, L, R, F, interpret=interpret)(
        J, r, *idxs)
