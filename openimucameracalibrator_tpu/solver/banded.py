"""Block-tridiagonal + arrowhead damped solve for the spline normal equations.

The continuous-time problem's Hessian is NOT generic dense: every residual
touches <= ORDER contiguous SO3 knots, <= ORDER contiguous R3 knots and a
small set of global parameters (biases, gravity, T_i_c, line delay, time
offset, IMU intrinsics, board points) — see core/spline_estimator.py:19-22
and the reference's band observation (SURVEY.md §5: "J^T J is block-banded
... halo width N-1"). The reference leans on Ceres SPARSE_NORMAL_CHOLESKY
for the same structure (spline_trajectory_estimator.impl.h:254-276).

Dense D x D Cholesky at recording scale (D ~ 5.7k) is ~62 GFLOP per solve
and dominates TPU latency with a sequential panel factorization. Here the
knot coordinates are grouped into TIME SLABS (so3 knots + r3 knots whose
support lies in one slab interval); measurement windows then couple only
ADJACENT slabs, so the knot-knot block is block-tridiagonal over slabs and
factorizes with a lax.scan of small per-slab Cholesky/triangular ops —
O(D * slab^2) instead of O(D^3/3). The global-parameter tail is handled as
an arrowhead by a Schur complement: one block-tridiagonal solve with
(tail+1) right-hand sides, a small dense tail solve, one back-substitution.

Structure is verified HOST-SIDE at build time against the problem's actual
measurement windows (``from_problem`` checks every window couples only
adjacent slabs and widens the slab until it holds), so the traced solve
never sees an assumption it hasn't proven.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SlabStructure(NamedTuple):
    """Static (host-side) slab decomposition of the tangent space."""

    idx: np.ndarray      # (K, smax) int32 tangent coords per slab (pad -> 0)
    valid: np.ndarray    # (K, smax) bool
    tail: np.ndarray     # (De,) int32 tangent coords of the arrow tail
    tangent_dim: int


def build_structure(layout, n_so3: int, n_r3: int, dt_so3: float,
                    dt_r3: float, slab_time: float) -> SlabStructure:
    """Group so3/r3 knot coordinates into time slabs of width slab_time.

    Knot i of a spline with spacing dt supports t in
    [t0 + (i - ORDER + 1) dt, t0 + (i + 1) dt); slab membership uses the
    knot's anchor time i*dt (monotone in i, so slabs are contiguous index
    ranges)."""
    off_s = layout.offsets["q_so3"]
    off_r = layout.offsets["t_r3"]
    ks = (np.arange(n_so3) * dt_so3 / slab_time).astype(np.int64)
    kr = (np.arange(n_r3) * dt_r3 / slab_time).astype(np.int64)
    nslab = int(max(ks.max(), kr.max())) + 1
    slabs = []
    for k in range(nslab):
        coords = []
        for i in np.nonzero(ks == k)[0]:
            coords.extend(off_s + 3 * i + np.arange(3))
        for i in np.nonzero(kr == k)[0]:
            coords.extend(off_r + 3 * i + np.arange(3))
        slabs.append(np.asarray(coords, np.int32))
    smax = max(len(c) for c in slabs)
    idx = np.zeros((nslab, smax), np.int32)
    valid = np.zeros((nslab, smax), bool)
    for k, c in enumerate(slabs):
        idx[k, :len(c)] = c
        valid[k, :len(c)] = True
    band = set(int(x) for c in slabs for x in c)
    tail = np.asarray([d for d in range(layout.tangent_dim)
                       if d not in band], np.int32)
    return SlabStructure(idx=idx, valid=valid, tail=tail,
                         tangent_dim=layout.tangent_dim)


def _windows_adjacent(struct: SlabStructure, n_so3, n_r3, dt_so3, dt_r3,
                      slab_time, times, order) -> bool:
    """Host check: every measurement window at the given times couples
    only coordinates of the same or adjacent slabs."""
    t = np.asarray(times, np.float64)
    i_s = np.clip(np.floor(t / dt_so3), 0, n_so3 - order).astype(np.int64)
    i_r = np.clip(np.floor(t / dt_r3), 0, n_r3 - order).astype(np.int64)
    ks_lo = (i_s * dt_so3 / slab_time).astype(np.int64)
    ks_hi = ((i_s + order - 1) * dt_so3 / slab_time).astype(np.int64)
    kr_lo = (i_r * dt_r3 / slab_time).astype(np.int64)
    kr_hi = ((i_r + order - 1) * dt_r3 / slab_time).astype(np.int64)
    lo = np.minimum(ks_lo, kr_lo)
    hi = np.maximum(ks_hi, kr_hi)
    return bool(np.all(hi - lo <= 1))


def from_problem(layout, p, order: int, margin: float = 1.3):
    """SlabStructure for a SplineProblem, with slab width chosen so the
    adjacency property provably holds for ITS measurement times; returns
    None when no valid decomposition exists below one-slab degeneracy
    (callers fall back to the dense solve)."""
    # Times are relative to t0 in the window computation.
    times = np.concatenate([np.asarray(p.accel_t, np.float64),
                            np.asarray(p.gyro_t, np.float64),
                            np.asarray(p.obs_t, np.float64)]) - p.t0
    slab_time = margin * order * max(p.dt_so3, p.dt_r3)
    dur = max((p.n_so3 - 1) * p.dt_so3, (p.n_r3 - 1) * p.dt_r3)
    while slab_time < dur:
        if _windows_adjacent(None, p.n_so3, p.n_r3, p.dt_so3, p.dt_r3,
                             slab_time, times, order):
            struct = build_structure(layout, p.n_so3, p.n_r3, p.dt_so3,
                                     p.dt_r3, slab_time)
            if struct.idx.shape[0] >= 3:
                return struct
            return None  # <3 slabs: dense is as good
        slab_time *= 1.5
    return None


def _tri_solve(L, B, lower=True, trans=False):
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower,
                                             trans=1 if trans else 0)


def make_banded_solver(struct: SlabStructure):
    """Returns ``solve_fn(H, g, lam) -> delta`` for lm.lm_optimize.

    Contract identical to lm._solve_damped: solves
    (Hs + lam I) y = -(s g) on the Jacobi-scaled system (s = rsqrt(diag H))
    and returns s*y, with one iterative-refinement pass. The factorization
    is block-tridiagonal over slabs + dense Schur complement on the tail.
    """
    idx = jnp.asarray(struct.idx)
    vmask = jnp.asarray(struct.valid)
    tail = jnp.asarray(struct.tail)
    K, smax = struct.idx.shape
    De = int(struct.tail.shape[0])

    def _band_sub(Ls, Lsubs, R):
        """Forward+backward substitution through the block-bidiagonal
        Cholesky factor for stacked rhs R (K, smax, m)."""
        dt = R.dtype

        def fwd(y_prev, x):
            Lk, Lsub_k, r_k = x
            y_k = _tri_solve(Lk, r_k - Lsub_k @ y_prev, lower=True)
            return y_k, y_k

        m = R.shape[-1]
        _, Ys = jax.lax.scan(fwd, jnp.zeros((smax, m), dt), (Ls, Lsubs, R))

        def bwd(x_next, xk):
            Lk, Lsub_next, y_k = xk
            x_k = _tri_solve(Lk, y_k - Lsub_next.T @ x_next, lower=True,
                             trans=True)
            return x_k, x_k

        # L_{k+1,k} couples x_k to y-terms of k+1: shift Lsubs by one.
        Lsub_next = jnp.concatenate([Lsubs[1:],
                                     jnp.zeros((1, smax, smax), dt)], axis=0)
        _, Xs = jax.lax.scan(bwd, jnp.zeros((smax, m), dt),
                             (Ls, Lsub_next, Ys), reverse=True)
        return Xs * vmask.astype(dt)[:, :, None]

    def _factor(Hd):
        """Factor once: block-tridiagonal Cholesky of the slab system plus
        the tail Schur complement. Returns everything substitution needs."""
        dt = Hd.dtype
        v = vmask.astype(dt)
        # Gather slab blocks (static index arrays -> XLA gathers).
        A = Hd[idx[:, :, None], idx[:, None, :]]
        A = A * v[:, :, None] * v[:, None, :] \
            + jnp.eye(smax, dtype=dt) * (1.0 - v)[:, :, None]
        B = Hd[idx[1:, :, None], idx[:-1, None, :]]
        B = B * v[1:, :, None] * v[:-1, None, :]
        B = jnp.concatenate([jnp.zeros((1, smax, smax), dt), B], axis=0)

        def fwd(L_prev, x):
            A_k, B_k = x
            Lsub = _tri_solve(L_prev, B_k.T, lower=True).T  # B_k L_prev^{-T}
            Lk = jnp.linalg.cholesky(A_k - Lsub @ Lsub.T)
            return Lk, (Lk, Lsub)

        _, (Ls, Lsubs) = jax.lax.scan(fwd, jnp.eye(smax, dtype=dt), (A, B))

        CT = Hd[idx[:, :, None], tail[None, None, :]] * v[:, :, None]
        Xc = _band_sub(Ls, Lsubs, CT)           # T^{-1} C
        E = Hd[tail[:, None], tail[None, :]]
        S = E - jnp.einsum("ksd,kse->de", CT, Xc)
        Lt = jax.scipy.linalg.cho_factor(S, lower=True)
        return Ls, Lsubs, CT, Xc, Lt

    def _substitute(factors, b):
        Ls, Lsubs, CT, Xc, Lt = factors
        dt = b.dtype
        Rs = (b[idx] * vmask.astype(dt))[:, :, None]
        Xr = _band_sub(Ls, Lsubs, Rs)
        rhs_t = b[tail][:, None] - jnp.einsum("ksd,ksm->dm", CT, Xr)
        Xt = jax.scipy.linalg.cho_solve(Lt, rhs_t)
        Xb = Xr - jnp.einsum("ksd,dm->ksm", Xc, Xt)
        y = jnp.zeros((struct.tangent_dim,), dt)
        y = y.at[idx].add(Xb[..., 0] * vmask.astype(dt))
        y = y.at[tail].set(Xt[..., 0])
        return y

    def solve_fn(H, g, lam):
        dt = H.dtype
        d = jnp.diag(H)
        s = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
        Hs = H * s[:, None] * s[None, :]
        Hd = Hs + lam * jnp.eye(H.shape[0], dtype=dt)
        b = -(s * g)

        factors = _factor(Hd)
        y = _substitute(factors, b)
        # One iterative-refinement pass REUSING the factorization
        # (mirrors lm._solve_damped's refinement; recovers f32 bits).
        r = Hd @ y - b
        y = y + _substitute(factors, -r)
        return s * y

    return solve_fn
