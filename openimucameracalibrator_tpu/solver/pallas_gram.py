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
    """
    T = min(tile_rows, _round_up(R, 8))
    Rp = _round_up(R, T)
    n_tiles = Rp // T
    Lp = _round_up(L, 128)
    n_run = sum(1 for s in segments if s[0] == "run")

    def kernel(jref, rref, *refs):
        idx_refs = refs[:n_run]
        href, gref = refs[n_run], refs[n_run + 1]
        jt = jref[...]                    # (T, F)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, Lp), 1)
        dense = jnp.zeros((T, Lp), jnp.float32)
        run_i = 0
        for seg in segments:
            if seg[0] == "run":
                _, col0, nblk, td, wblk, out_off = seg
                idx = idx_refs[run_i][...]  # (T, 1) int32
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
        gt = jax.lax.dot_general(rref[...], dense, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            href[...] = ht
            gref[...] = gt

        @pl.when(pl.program_id(0) != 0)
        def _():
            href[...] += ht
            gref[...] += gt

    row_spec = pl.BlockSpec((T, F), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col1_spec = pl.BlockSpec((T, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((Lp, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[row_spec, col1_spec] + [col1_spec] * n_run,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((Lp, Lp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Lp), jnp.float32)],
        interpret=interpret,
    )

    def fused(J, r, *idxs):
        assert J.shape == (R, F), (J.shape, (R, F))
        assert len(idxs) == n_run, (len(idxs), n_run)
        pad = Rp - R
        Jp = jnp.pad(J.astype(jnp.float32), ((0, pad), (0, 0)))
        rp = jnp.pad(r.astype(jnp.float32), (0, pad))[:, None]
        ip = [jnp.pad(i.astype(jnp.int32), (0, pad))[:, None] for i in idxs]
        H, g = call(Jp, rp, *ip)
        return H[:L, :L], g[0, :L]

    return fused


@functools.partial(jax.jit, static_argnames=("segments", "L", "interpret"))
def fused_gram(J, r, idxs, segments, L: int, interpret: bool = False):
    """One-shot convenience wrapper (jits per (segments, shapes))."""
    R, F = J.shape
    return make_fused_gram(segments, L, R, F, interpret=interpret)(
        J, r, *idxs)
