"""Fused densify+Gram Pallas kernel vs the XLA reference path.

The kernel (solver/pallas_gram.py) must reproduce exactly the H, g that
core/spline_estimator._densify_segments + the Gram matmul produce — it
is a fusion, not an approximation. Runs in Pallas interpret mode on the
CPU test mesh; the device win is measured by the bench breakdown stage.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from openimucameracalibrator_tpu.core import spline_estimator as se
from openimucameracalibrator_tpu.solver import pallas_gram


def _xla_reference(J, r, segments_k, L):
    """Densify via the production helper, then the plain Gram."""
    C, rd, F = J.shape
    segs = []
    for seg in segments_k:
        if seg[0] == "run":
            _, col0, nblk, td, wblk, out_off, idx = seg
            segs.append(("run", col0, nblk, td, jnp.asarray(idx), wblk))
        else:
            _, col0, ncols, out_off = seg
            segs.append(("fixed", col0, ncols))
    Jd, rf = se._densify_segments(jnp.asarray(r), jnp.asarray(J), segs, L)
    return Jd.T @ Jd, Jd.T @ rf


def _random_problem(rng, C=37, rd=2, ws=9, wr=5, n_fixed=8):
    ORDER = 4
    F = 3 * ORDER + 6 + 3 * ORDER + n_fixed  # gap between runs like _reproj
    col_r = 3 * ORDER + 6
    col_f = col_r + 3 * ORDER
    J = rng.normal(size=(C, C and rd, F)).astype(np.float32)
    r = rng.normal(size=(C * rd,)).astype(np.float32)
    idx_s = rng.integers(0, ws - ORDER + 1, size=C).astype(np.int32)
    idx_r = rng.integers(0, wr - ORDER + 1, size=C).astype(np.int32)
    L = 3 * ws + 3 * wr + n_fixed
    segments_k = (("run", 0, ORDER, 3, ws, 0, np.repeat(idx_s, rd)),
                  ("run", col_r, ORDER, 3, wr, 3 * ws,
                   np.repeat(idx_r, rd)),
                  ("fixed", col_f, n_fixed, 3 * ws + 3 * wr))
    # _densify_segments takes per-MEASUREMENT indices (C,), the kernel
    # per-ROW (C*rd,).
    segments_ref = (("run", 0, ORDER, 3, ws, 0, idx_s),
                    ("run", col_r, ORDER, 3, wr, 3 * ws, idx_r),
                    ("fixed", col_f, n_fixed, 3 * ws + 3 * wr))
    return J, r, segments_k, segments_ref, L, F


def test_fused_gram_matches_xla():
    rng = np.random.default_rng(0)
    J, r, segments_k, segments_ref, L, F = _random_problem(rng)
    C, rd, _ = J.shape

    H_ref, g_ref = _xla_reference(J, r, segments_ref, L)

    static = tuple(s[:-1] if s[0] == "run" else s for s in segments_k)
    idxs = tuple(jnp.asarray(s[-1]) for s in segments_k if s[0] == "run")
    fused = pallas_gram.make_fused_gram(static, L, C * rd, F,
                                        tile_rows=32, interpret=True)
    H, g = fused(jnp.asarray(J.reshape(C * rd, F)), jnp.asarray(r), *idxs)

    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_gram_row_padding():
    """Row counts that do not divide the tile size contribute zeros."""
    rng = np.random.default_rng(1)
    J, r, segments_k, segments_ref, L, F = _random_problem(rng, C=11)
    C, rd, _ = J.shape
    H_ref, g_ref = _xla_reference(J, r, segments_ref, L)
    static = tuple(s[:-1] if s[0] == "run" else s for s in segments_k)
    idxs = tuple(jnp.asarray(s[-1]) for s in segments_k if s[0] == "run")
    fused = pallas_gram.make_fused_gram(static, L, C * rd, F,
                                        tile_rows=16, interpret=True)
    H, g = fused(jnp.asarray(J.reshape(C * rd, F)), jnp.asarray(r), *idxs)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_gram_vmap_chunks():
    """vmap over the chunk axis (how the linearizer integrates it)."""
    rng = np.random.default_rng(2)
    K = 3
    packs = [_random_problem(rng, C=24) for _ in range(K)]
    J, r, segments_k, segments_ref, L, F = packs[0]
    C, rd, _ = J.shape
    static = tuple(s[:-1] if s[0] == "run" else s for s in segments_k)
    fused = pallas_gram.make_fused_gram(static, L, C * rd, F,
                                        tile_rows=16, interpret=True)

    Js = jnp.stack([p[0].reshape(C * rd, F) for p in packs])
    rs = jnp.stack([p[1] for p in packs])
    i0 = jnp.stack([p[2][0][-1] for p in packs])
    i1 = jnp.stack([p[2][1][-1] for p in packs])

    Hb, gb = jax.vmap(fused)(Js, rs, i0, i1)
    for k, p in enumerate(packs):
        H_ref, g_ref = _xla_reference(p[0], p[1], p[3], L)
        np.testing.assert_allclose(np.asarray(Hb[k]), np.asarray(H_ref),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-4)


def test_linearizer_pallas_gram_end_to_end():
    """Full fast linearizer with gram_kernel="pallas" equals the XLA
    path on a real (tiny) spline problem: H, g and cost all match."""
    import __graft_entry__ as ge

    p, params = ge._tiny_problem()
    layout = se.build_layout(p)
    plans, arrs = se.plan_fast_assembly(p, obs_chunk=64, imu_chunk=32)
    bases = se.plan_bases(plans)

    lin_x = se.make_fast_linearizer(p, layout, plans)
    lin_p = se.make_fast_linearizer(p, layout, plans, gram_kernel="pallas")
    Hx, gx, cx = jax.jit(lambda q: lin_x(q, arrs, bases))(params)
    Hp, gp, cp = jax.jit(lambda q: lin_p(q, arrs, bases))(params)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Hp), np.asarray(Hx),
                               rtol=1e-4, atol=1e-3)
