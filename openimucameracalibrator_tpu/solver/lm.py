"""Levenberg-Marquardt core, jit-compiled end-to-end.

TPU-native replacement for the reference's Ceres solves (LM trust region +
SPARSE_NORMAL_CHOLESKY, spline_trajectory_estimator.impl.h:254-276 and
Theia bundle adjustment, camera_calibrator.cc:131-219). Design:

* The whole LM loop is a single ``lax.while_loop`` under ``jit`` — no
  host round-trips per iteration.
* The expensive step, linearization, is pluggable: ``linearize_fn(params)
  -> (H, g, cost)`` returns dense normal equations. Small problems use
  :func:`make_dense_linearizer` (jacfwd over the tangent); the
  continuous-time spline problem supplies a structured assembler that
  scatter-adds per-measurement block Jacobians (each touches a static
  ≤6-knot window) into H — the TPU analog of Ceres' block-sparse CRS.
* Damping is Marquardt-style, scaled by diag(H); rejected steps retry with
  a larger lambda *without* re-linearizing (inner while_loop).
* Fixed parameters are a static 0/1 mask over the tangent vector (see
  blocks.BlockLayout.free_mask); masked coordinates get an identity
  diagonal so the dense Cholesky stays well-posed.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    max_iters: int = 50
    lam0: float = 1e-4
    lam_down: float = 1.0 / 3.0
    lam_up: float = 4.0
    lam_min: float = 1e-12
    lam_max: float = 1e10
    ftol: float = 1e-6
    max_inner: int = 8
    history_len: int = 64  # static size of the recorded cost trace


# Termination statuses (the reference distinguishes Ceres termination
# types; conflating "trust region exhausted" with "converged" hides
# divergence on hard problems).
STATUS_MAX_ITERS = 0  # iteration cap hit while still making progress
STATUS_CONVERGED = 1  # accepted step with relative decrease < ftol
STATUS_NO_PROGRESS = 2  # no inner damping retry produced a decrease

STATUS_NAMES = {STATUS_MAX_ITERS: "NO_CONVERGENCE",
                STATUS_CONVERGED: "CONVERGENCE",
                STATUS_NO_PROGRESS: "TRUST_REGION_EXHAUSTED"}


class LMResult(NamedTuple):
    params: dict
    cost: jax.Array
    iterations: jax.Array
    lam: jax.Array
    converged: jax.Array  # status == STATUS_CONVERGED
    status: jax.Array = jnp.asarray(STATUS_MAX_ITERS)
    # cost after each accepted outer iteration, NaN beyond ``iterations``
    # (observability: the trace is carried through the while_loop and
    # emitted into the result json — no host callbacks needed).
    cost_history: jax.Array = jnp.zeros((0,))


def _mask_system(H, g, mask):
    """Zero fixed rows/cols of H and g; unit diagonal on fixed coords."""
    Hm = H * mask[:, None] * mask[None, :]
    Hm = Hm + jnp.diag(1.0 - mask)
    return Hm, g * mask


def _solve_damped(H, g, lam):
    """Solve (H + lam * diag(H)) delta = -g via Jacobi-equilibrated Cholesky.

    Scaling H to unit diagonal first keeps the factorization well-
    conditioned in float32 on TPU (the damped system becomes Hs + lam*I
    with diag(Hs) = 1); one step of iterative refinement against the same
    factorization recovers most of the bits f32 loses at calibration-
    problem conditioning (precision policy, utils/precision.py; tested in
    tests/test_precision.py). On failure the solution contains NaN and the
    LM step is rejected.
    """
    d = jnp.diag(H)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    Hs = H * s[:, None] * s[None, :]
    Hd = Hs + lam * jnp.eye(H.shape[0], dtype=H.dtype)
    L, lower = jax.scipy.linalg.cho_factor(Hd, lower=True)
    b = -(s * g)
    y = jax.scipy.linalg.cho_solve((L, lower), b)
    r = Hd @ y - b
    y = y - jax.scipy.linalg.cho_solve((L, lower), r)
    return s * y


def lm_optimize(
    linearize_fn: Callable,
    cost_fn: Callable,
    retract_fn: Callable,
    params0: dict,
    free_mask: jax.Array,
    config: LMConfig = LMConfig(),
    *,
    solve_fn: Callable | None = None,
    mask_fn: Callable | None = None,
    strategy: str = "classic",
) -> LMResult:
    """Run LM. All callables must be jit-traceable; params are a pytree.

    The normal equations are pluggable end to end: ``linearize_fn(params)
    -> (H, g, cost)`` where (H, g) may be ANY pytree as long as the
    matching ``mask_fn(H, g, free_mask) -> (H, g)`` and ``solve_fn(H, g,
    lam) -> delta (D,)`` understand it. Defaults implement the dense path
    (D x D Hessian, Jacobi-equilibrated damped Cholesky); the knot-sharded
    distributed Schur solver (parallel/schur.py) supplies its own pair and
    never materializes the full Hessian on any device.

    ``strategy`` selects the loop shape:

    * "classic" — linearize once per outer iteration, then an inner
      damping loop of (solve, retract, cost_fn) trials. One full
      ``cost_fn`` evaluation per trial.
    * "fused" — the trial cost comes from ``linearize_fn(candidate)``
      itself, so an ACCEPTED trial's linearization is the next
      iteration's normal equations and the standalone cost path is never
      executed (``cost_fn`` is unused). On the v5e at DS3 scale the trial
      loop dominates LM wall time (r4: 62 ms linearize + 2.2 trials x
      [31 ms solve + 40 ms cost] per iteration); fusing makes every
      iteration exactly one solve + one linearize. A REJECTED trial pays
      a linearize instead of a cost eval, which the gain-ratio damping
      below makes rare. Iteration counts follow Ceres semantics (every
      trial step counts, successful or not).

    Both strategies use gain-ratio (Nielsen) damping when the normal
    equations are a plain dense matrix: rho = actual/predicted decrease,
    lam *= max(1/3, 1-(2 rho-1)^3) on accept, lam *= nu, nu *= 2 on
    reject. For pytree H (the distributed Schur path) the predicted
    decrease is unavailable generically and the classic multiplicative
    schedule is used.
    """

    cfg = config
    if strategy == "fused":
        return _lm_optimize_fused(linearize_fn, retract_fn, params0,
                                  free_mask, cfg, solve_fn=solve_fn,
                                  mask_fn=mask_fn)
    if strategy != "classic":
        raise ValueError(f"unknown LM strategy: {strategy!r}")
    mask_fn = mask_fn or (lambda H, g, m: _mask_system(H, g, m.astype(g.dtype)))
    solve_fn = solve_fn or _solve_damped

    def outer_cond(state):
        params, cost, lam, it, status, hist = state
        return (it < cfg.max_iters) & (status == STATUS_MAX_ITERS)

    def outer_body(state):
        params, cost, lam, it, _, hist = state
        H, g, cost_lin = linearize_fn(params)
        H, g = mask_fn(H, g, free_mask)

        def inner_cond(s):
            _, _, _, accepted, tries = s
            return (~accepted) & (tries < cfg.max_inner)

        def inner_body(s):
            best_params, best_cost, lam_i, _, tries = s
            delta = solve_fn(H, g, lam_i) * free_mask.astype(cost_lin.dtype)
            cand = retract_fn(params, delta)
            cand_cost = cost_fn(cand)
            good = jnp.isfinite(cand_cost) & (cand_cost < cost_lin)
            new_lam = jnp.where(good,
                                jnp.maximum(lam_i * cfg.lam_down, cfg.lam_min),
                                jnp.minimum(lam_i * cfg.lam_up, cfg.lam_max))
            out_params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(good, b, a), best_params, cand)
            out_cost = jnp.where(good, cand_cost, best_cost)
            return out_params, out_cost, new_lam, good, tries + 1

        init = (params, cost_lin, lam, jnp.asarray(False), jnp.asarray(0))
        new_params, new_cost, new_lam, accepted, _ = jax.lax.while_loop(
            inner_cond, inner_body, init)

        rel_decrease = (cost_lin - new_cost) / jnp.maximum(cost_lin, 1e-20)
        status = jnp.where(
            accepted & (rel_decrease < cfg.ftol), STATUS_CONVERGED,
            jnp.where(accepted, STATUS_MAX_ITERS, STATUS_NO_PROGRESS))
        # Record the first history_len entries; later iterations leave the
        # trace intact (no silent overwrite of the last slot on long runs).
        slot = jnp.minimum(it, cfg.history_len - 1)
        hist = hist.at[slot].set(
            jnp.where(it < cfg.history_len, new_cost, hist[slot]))
        return new_params, new_cost, new_lam, it + 1, status, hist

    cost0 = cost_fn(params0)
    lam = jnp.asarray(cfg.lam0, dtype=cost0.dtype)
    hist0 = jnp.full((cfg.history_len,), jnp.nan, dtype=cost0.dtype)
    state = (params0, cost0, lam, jnp.asarray(0), jnp.asarray(STATUS_MAX_ITERS),
             hist0)
    params, cost, lam, it, status, hist = jax.lax.while_loop(
        outer_cond, outer_body, state)
    return LMResult(params, cost, it, lam, status == STATUS_CONVERGED,
                    status, hist)


def _predicted_decrease(H, g, delta):
    """-(g . d + 0.5 d.H.d) for a dense masked system; None for pytree H
    (the distributed Schur path), where the quadratic form has no generic
    implementation and the caller falls back to multiplicative damping."""
    if isinstance(H, jax.Array) and H.ndim == 2:
        return -(jnp.dot(g, delta) + 0.5 * jnp.dot(delta, H @ delta))
    return None


def _lm_optimize_fused(
    linearize_fn: Callable,
    retract_fn: Callable,
    params0: dict,
    free_mask: jax.Array,
    cfg: LMConfig,
    *,
    solve_fn: Callable | None = None,
    mask_fn: Callable | None = None,
) -> LMResult:
    """Fused trial loop: see :func:`lm_optimize` (strategy="fused")."""
    mask_fn = mask_fn or (lambda H, g, m: _mask_system(H, g, m.astype(g.dtype)))
    solve_fn = solve_fn or _solve_damped

    H0, g0, cost0 = linearize_fn(params0)
    H0, g0 = mask_fn(H0, g0, free_mask)
    fdtype = cost0.dtype
    fmask = free_mask.astype(fdtype)

    def cond(state):
        _, _, _, _, _, _, it, rejects, status, _ = state
        return ((it < cfg.max_iters) & (status == STATUS_MAX_ITERS)
                & (rejects < cfg.max_inner))

    def body(state):
        params, cost, H, g, lam, nu, it, rejects, _, hist = state
        delta = solve_fn(H, g, lam) * fmask
        cand = retract_fn(params, delta)
        Hc, gc, cost_c = linearize_fn(cand)
        Hc, gc = mask_fn(Hc, gc, free_mask)
        good = jnp.isfinite(cost_c) & (cost_c < cost)

        pred = _predicted_decrease(H, g, delta)
        if pred is not None:
            rho = (cost - cost_c) / jnp.maximum(pred, 1e-20)
            shrink = jnp.maximum(1.0 / 3.0,
                                 1.0 - (2.0 * rho - 1.0) ** 3)
            lam_acc = jnp.clip(lam * shrink, cfg.lam_min, cfg.lam_max)
        else:
            lam_acc = jnp.maximum(lam * cfg.lam_down, cfg.lam_min)
        lam_rej = jnp.minimum(lam * nu, cfg.lam_max)
        new_lam = jnp.where(good, lam_acc, lam_rej)
        new_nu = jnp.where(good, jnp.asarray(2.0, fdtype), nu * 2.0)

        sel = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
            lambda x, y: jnp.where(good, y, x), a, b)
        new_params = sel(params, cand)
        new_cost = jnp.where(good, cost_c, cost)
        new_H = sel(H, Hc)
        new_g = sel(g, gc)

        rel_decrease = (cost - cost_c) / jnp.maximum(cost, 1e-20)
        status = jnp.where(good & (rel_decrease < cfg.ftol),
                           STATUS_CONVERGED, STATUS_MAX_ITERS)
        new_rejects = jnp.where(good, 0, rejects + 1)
        slot = jnp.minimum(it, cfg.history_len - 1)
        hist = hist.at[slot].set(
            jnp.where(it < cfg.history_len, new_cost, hist[slot]))
        return (new_params, new_cost, new_H, new_g, new_lam, new_nu,
                it + 1, new_rejects, status, hist)

    lam = jnp.asarray(cfg.lam0, fdtype)
    nu = jnp.asarray(2.0, fdtype)
    hist0 = jnp.full((cfg.history_len,), jnp.nan, dtype=fdtype)
    state = (params0, cost0, H0, g0, lam, nu, jnp.asarray(0),
             jnp.asarray(0), jnp.asarray(STATUS_MAX_ITERS), hist0)
    (params, cost, _, _, lam, _, it, rejects, status, hist) = (
        jax.lax.while_loop(cond, body, state))
    status = jnp.where((status == STATUS_MAX_ITERS)
                       & (rejects >= cfg.max_inner),
                       STATUS_NO_PROGRESS, status)
    return LMResult(params, cost, it, lam, status == STATUS_CONVERGED,
                    status, hist)


def make_dense_linearizer(residual_fn: Callable, layout, weight_fn: Callable | None = None):
    """Build (linearize_fn, cost_fn, retract_fn) from a flat residual function.

    ``residual_fn(params) -> (M,)`` whitened residuals. ``weight_fn(r) ->
    (M,)`` optional IRLS sqrt-weights (see robust.huber_sqrt_weights),
    recomputed each outer iteration and treated as constant during the step.
    Jacobian via jacfwd over the tangent delta — suitable for tangent dims
    up to a few thousand.
    """

    def weighted_residual(params):
        r = residual_fn(params)
        if weight_fn is not None:
            r = r * jax.lax.stop_gradient(weight_fn(r))
        return r

    def cost_fn(params):
        r = weighted_residual(params)
        return 0.5 * jnp.sum(r * r)

    def linearize_fn(params):
        r = residual_fn(params)
        w = weight_fn(r) if weight_fn is not None else jnp.ones_like(r)
        w = jax.lax.stop_gradient(w)

        def r_of_delta(delta):
            return residual_fn(layout.retract(params, delta)) * w

        delta0 = jnp.zeros((layout.tangent_dim,), dtype=r.dtype)
        J = jax.jacfwd(r_of_delta)(delta0)  # (M, D)
        rw = r * w
        H = J.T @ J
        g = J.T @ rw
        return H, g, 0.5 * jnp.sum(rw * rw)

    return linearize_fn, cost_fn, layout.retract
