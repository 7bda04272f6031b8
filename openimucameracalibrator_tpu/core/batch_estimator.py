"""Multi-sequence batched continuous-time calibration (BASELINE configs[4]).

The reference calibrates one recording at a time (its Readme tables run the
per-dataset pipeline seven times, /root/reference/Readme.md:31-51). On TPU
a single recording's spline problem is far too small to fill the chip —
the interesting regime is N recordings solved TOGETHER:

* ``mode="independent"`` — N sequences, N separate solutions, one compiled
  program: every per-sequence measurement array is padded to common shapes
  and stacked on a leading sequence axis, the chunk-local linearizer
  (core/spline_estimator.make_fast_linearizer) is vmapped over that axis,
  and the whole LM loop (while_loop included) runs vmapped, so residual/
  Jacobian evaluation, the per-chunk Gram products, and the N damped
  Cholesky factorizations are rank-+1 batched MXU ops. Numerically
  equivalent to N single-sequence solves (tested).

* ``mode="joint"`` — the physically meaningful multi-sequence calibration:
  one rig recorded N times. Per-sequence trajectories, biases, gravity
  (and by default the clock offset) stay per-sequence; the rig parameters
  in ``shared`` (T_imu_cam, rolling-shutter line delay, IMU intrinsics)
  are constrained equal across sequences. The normal equations then have
  arrowhead structure — block-diagonal per-sequence systems bordered by
  the small shared block — and the solve is a batched-Cholesky Schur
  elimination onto the shared block:

      S  = sum_i (C_i - B_i^T A_i^{-1} B_i)          (S x S, tiny)
      ds = S^{-1} (sum_i B_i^T A_i^{-1} gx_i - gs)
      dx_i = -A_i^{-1} (gx_i + B_i ds)               (batched)

Constraints (v1): sequences must share the camera model + intrinsics,
rolling-shutter mode, and the trajectory knot spacings dt_so3/dt_r3 (use a
common SEW choice, e.g. the minimum over sequences — knot spacing is a
solver hyperparameter, not data). Per-sequence time origins, SEW weights,
and bias-knot spacing are traced through one compiled graph
(PROBLEM_OVERRIDE_KEYS). Board-point (POINTS) blocks are not yet
supported in batch mode.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.core import spline_estimator as se
from openimucameracalibrator_tpu.solver import lm, robust

# Rig parameters shared across sequences in joint mode. gravity and
# time_offset stay per-sequence by default (each recording has its own
# world frame; clock alignment can drift between recordings) — pass a
# custom ``shared`` tuple to optimize_batch to change that.
DEFAULT_SHARED = ("q_i_c", "t_i_c", "line_delay", "accl_intr", "gyro_intr")


class SequenceBatch(NamedTuple):
    """N padded sequences stacked for one compiled solver."""

    p_ref: se.SplineProblem  # common statics, knot counts = per-seq maxima
    plans: tuple  # common ChunkPlan triple (widths = per-seq maxima)
    arrs: dict  # stacked chunked measurement arrays, leading axis N
    bases: dict  # stacked per-chunk knot bases + per-seq scalar overrides
    pad_masks: np.ndarray  # (N, D) 1.0 on real tangent coords, 0.0 on padding
    knot_counts: tuple  # [(n_so3_i, n_r3_i, n_bias_i)] for unpadding
    n_seq: int


def _common_statics(problems: Sequence[se.SplineProblem]) -> None:
    p0 = problems[0]
    for k, p in enumerate(problems[1:], 1):
        for f in ("model_name", "rolling_shutter", "dt_so3", "dt_r3"):
            if getattr(p, f) != getattr(p0, f):
                raise ValueError(
                    f"sequence {k} differs from sequence 0 in {f!r} "
                    f"({getattr(p, f)} vs {getattr(p0, f)}); batched "
                    "sequences must share the camera model and knot "
                    "spacings (pick one SEW dt, e.g. the minimum)")
        if not np.array_equal(np.asarray(p.cam_params),
                              np.asarray(p0.cam_params)):
            raise ValueError(f"sequence {k} has different camera intrinsics")
        if p.n_points > 0 or p0.n_points > 0:
            raise ValueError("POINTS blocks are not supported in batch mode")


def _pad_axis0(x: jnp.ndarray, n: int, value=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=value)


def build_sequence_batch(problems: Sequence[se.SplineProblem],
                         obs_chunk: int = 2048,
                         imu_chunk: int = 256) -> SequenceBatch:
    """Pad + stack N problems into one vmappable batch."""
    _common_statics(problems)
    p0 = problems[0]
    n_so3 = max(p.n_so3 for p in problems)
    n_r3 = max(p.n_r3 for p in problems)
    n_bias = max(p.n_bias for p in problems)
    p_ref = p0._replace(n_so3=n_so3, n_r3=n_r3, n_bias=n_bias, t0=0.0)

    per = [se.plan_fast_assembly(p, obs_chunk, imu_chunk) for p in problems]
    plan_lists = list(zip(*[pl for pl, _ in per]))  # (obs, acc, gyr) lists

    def _unify(plans, n_knots_s, n_knots_r):
        """ONE static chunk-base schedule covering every sequence.

        Sequences share the camera fps, IMU rate and knot spacings, so
        chunk k of every sequence spans (nearly) the same window of
        knot indices; a common base = elementwise min with the window
        widened to the common coverage keeps the chunk geometry
        HOST-KNOWN — which is what lets the linearizer use the
        scatter-free static accumulation inside the vmapped batch.
        """
        k = max(pl.n_chunks for pl in plans)

        def merged(bases_list, widths, n_knots):
            lo = np.full(k, np.iinfo(np.int32).max, np.int64)
            hi = np.zeros(k, np.int64)
            for pl_base, w in zip(bases_list, widths):
                b = np.asarray(pl_base)
                lo[:len(b)] = np.minimum(lo[:len(b)], b)
                hi[:len(b)] = np.maximum(hi[:len(b)], b + w)
            lo[lo == np.iinfo(np.int32).max] = 0
            w_common = min(int(np.max(hi - lo)) if k else 1, n_knots)
            base = np.clip(lo, 0, max(n_knots - w_common, 0))
            return base.astype(np.int32), w_common

        s_base, w_s = merged([pl.s_base for pl in plans],
                             [pl.w_s for pl in plans], n_knots_s)
        r_base, w_r = merged([pl.r_base for pl in plans],
                             [max(pl.w_r, 1) for pl in plans], n_knots_r)
        if all(pl.w_r == 0 for pl in plans):
            w_r = 0
        common = se.ChunkPlan(n_chunks=k, chunk=plans[0].chunk, w_s=w_s,
                              w_r=w_r, s_base=None, r_base=None)
        return common, s_base, r_base

    obs_plan, obs_s, obs_r = _unify(plan_lists[0], n_so3, n_r3)
    acc_plan, acc_s, acc_r = _unify(plan_lists[1], n_so3, n_r3)
    gyr_plan, gyr_s, _ = _unify(plan_lists[2], n_so3, n_r3)

    # Stack chunked arrays, padding the chunk axis to the common count.
    keys = per[0][1].keys()
    k_of = {"obs": obs_plan.n_chunks, "acc": acc_plan.n_chunks,
            "gyr": gyr_plan.n_chunks}
    arrs = {}
    for key in keys:
        fam = ("acc" if key.startswith("accel") else
               "gyr" if key.startswith("gyro") else "obs")
        val = False if key.endswith("valid") else 0
        arrs[key] = jnp.stack([_pad_axis0(a[key], k_of[fam], val)
                               for _, a in per])

    dtype = p0.obs_uv.dtype
    # Chunk bases are HOST-STATIC and shared by all sequences (see
    # _unify); only the per-sequence scalars are traced. optimize_batch
    # splits on this: np.ndarray leaves stay closure constants under vmap.
    bases = dict(
        obs_s=obs_s, obs_r=obs_r, acc_s=acc_s, acc_r=acc_r, gyr_s=gyr_s,
        t0=jnp.asarray([p.t0 for p in problems], dtype),
        w_accel=jnp.asarray([p.w_accel for p in problems], dtype),
        w_gyro=jnp.asarray([p.w_gyro for p in problems], dtype),
        dt_bias=jnp.asarray([p.dt_bias for p in problems], dtype),
        # Each sequence's REAL valid-time bound: knot arrays are padded to
        # the batch maximum, so the padded range must not admit
        # measurements past the sequence's own spline support.
        t_hi=jnp.asarray(
            [min(p.t0 + min((p.n_so3 - se.ORDER + 1) * p.dt_so3,
                            (p.n_r3 - se.ORDER + 1) * p.dt_r3),
                 np.inf if p.t_hi is None else p.t_hi)
             for p in problems], dtype))

    layout = se.build_layout(p_ref)
    pad_masks = np.ones((len(problems), layout.tangent_dim))
    for i, p in enumerate(problems):
        partial = {}
        for name, n_real, n_pad in (("q_so3", p.n_so3, n_so3),
                                    ("t_r3", p.n_r3, n_r3),
                                    ("bias_a", p.n_bias, n_bias),
                                    ("bias_g", p.n_bias, n_bias)):
            m = np.ones((n_pad, 3))
            m[n_real:] = 0.0
            partial[name] = m
        pad_masks[i] = np.asarray(layout.free_mask(partial_masks=partial))

    return SequenceBatch(p_ref=p_ref, plans=(obs_plan, acc_plan, gyr_plan),
                         arrs=arrs, bases=bases, pad_masks=pad_masks,
                         knot_counts=tuple((p.n_so3, p.n_r3, p.n_bias)
                                           for p in problems),
                         n_seq=len(problems))


def make_batch_cost(p_ref: se.SplineProblem):
    """cost(params, arrs, bases) from the stacked chunked arrays (one
    sequence's slice: arrs leaves (K, C, ...), bases scalars)."""

    def cost(params, arrs, bases):
        pov = {k: bases[k] for k in se.PROBLEM_OVERRIDE_KEYS if k in bases}
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in arrs.items()}
        pc = p_ref._replace(**flat, **pov)
        ra, _, _ = se._accel_eval(params, pc, with_jac=False)
        rg, _, _ = se._gyro_eval(params, pc, with_jac=False)
        rp, _, _ = se._reproj_eval(params, pc, with_jac=False)
        c = 0.5 * jnp.sum(ra * ra) + 0.5 * jnp.sum(rg * rg)
        return c + robust.huber_cost(rp.reshape(-1), se.HUBER_PX, group_size=2)

    return cost


def stack_params(batch: SequenceBatch, params_list: Sequence[dict]) -> dict:
    """Pad per-sequence init params to the batch shapes and stack (N, ...).

    Padded SO(3) knots are identity quaternions (valid manifold points);
    padded Euclidean knots are zero. Both are frozen by ``pad_masks`` and
    touched by no measurement.
    """
    p_ref = batch.p_ref
    out = {}
    for k in params_list[0]:
        rows = {"q_so3": p_ref.n_so3, "t_r3": p_ref.n_r3,
                "bias_a": p_ref.n_bias, "bias_g": p_ref.n_bias}.get(k)
        vals = []
        for prm in params_list:
            v = prm[k]
            if rows is not None and v.shape[0] < rows:
                pad = jnp.zeros((rows - v.shape[0],) + v.shape[1:], v.dtype)
                if k == "q_so3":
                    pad = pad.at[:, 0].set(1.0)
                v = jnp.concatenate([v, pad], axis=0)
            vals.append(v)
        out[k] = jnp.stack(vals)
    return out


def unstack_params(batch: SequenceBatch, params_b: dict) -> list:
    """Per-sequence param dicts, trimmed back to each sequence's knot counts."""
    out = []
    for i, (n_so3, n_r3, n_bias) in enumerate(batch.knot_counts):
        rows = {"q_so3": n_so3, "t_r3": n_r3, "bias_a": n_bias,
                "bias_g": n_bias}
        out.append({k: (v[i][:rows[k]] if k in rows else v[i])
                    for k, v in params_b.items()})
    return out


def _batch_masks(batch: SequenceBatch, layout, flags: frozenset) -> jnp.ndarray:
    flags_mask = np.asarray(layout.free_mask(fixed=se.flags_to_fixed(flags)))
    return jnp.asarray(batch.pad_masks * flags_mask[None, :])


def make_arrowhead_solver(layout, shared: Sequence[str]):
    """Damped solve for the joint system: (seq_idx, shared_idx, solve_fn).

    ``solve_fn(H_b (N,D,D), g_b (N,D), lam) -> delta (N, D)`` with the
    shared components of delta equal across sequences. Jacobi-equilibrated
    like lm._solve_damped: per-sequence coords scale by their own diagonal,
    shared coords by the cross-sequence summed diagonal, then +lam*I
    Marquardt damping in the scaled space.
    """
    shared_idx = np.concatenate(
        [np.arange(layout.slice_of(n).start, layout.slice_of(n).stop)
         for n in shared])
    seq_idx = np.setdiff1d(np.arange(layout.tangent_dim), shared_idx)
    shared_idx = jnp.asarray(shared_idx)
    seq_j = jnp.asarray(seq_idx)

    def solve(H_b, g_b, lam):
        A = H_b[:, seq_j[:, None], seq_j[None, :]]  # (N, Dx, Dx)
        B = H_b[:, seq_j[:, None], shared_idx[None, :]]  # (N, Dx, S)
        C = jnp.sum(H_b[:, shared_idx[:, None], shared_idx[None, :]], axis=0)
        gx = g_b[:, seq_j]
        gs = jnp.sum(g_b[:, shared_idx], axis=0)

        sx = jax.lax.rsqrt(jnp.maximum(
            jnp.diagonal(A, axis1=1, axis2=2), 1e-12))  # (N, Dx)
        ss = jax.lax.rsqrt(jnp.maximum(jnp.diag(C), 1e-12))  # (S,)
        eye_x = jnp.eye(A.shape[1], dtype=A.dtype)
        As = A * sx[:, :, None] * sx[:, None, :] + lam * eye_x
        Bs = B * sx[:, :, None] * ss[None, None, :]
        Cs = C * ss[:, None] * ss[None, :] + lam * jnp.eye(C.shape[0],
                                                           dtype=C.dtype)
        gxs = gx * sx
        gss = gs * ss

        cho = jax.vmap(lambda a: jax.scipy.linalg.cho_factor(a, lower=True))
        L, _ = cho(As)
        sol = jax.vmap(lambda l, b: jax.scipy.linalg.cho_solve((l, True), b))
        AiB = sol(L, Bs)  # (N, Dx, S)
        Aig = sol(L, gxs[:, :, None])[:, :, 0]  # (N, Dx)
        S_mat = Cs - jnp.einsum("nxs,nxt->st", Bs, AiB)
        rhs = jnp.einsum("nxs,nx->s", Bs, Aig) - gss
        ds = jnp.linalg.solve(S_mat, rhs)
        dx = -(Aig + jnp.einsum("nxs,s->nx", AiB, ds))
        delta = jnp.zeros(g_b.shape, g_b.dtype)
        delta = delta.at[:, seq_j].set(dx * sx)
        delta = delta.at[:, shared_idx].set((ds * ss)[None, :])
        return delta

    return solve


class BatchResult(NamedTuple):
    """Per-sequence solutions + solver diagnostics.

    ``params`` — list of per-sequence parameter dicts (original knot
    counts). In joint mode the ``shared`` blocks are identical across
    sequences. Diagnostic arrays are per-sequence in independent mode and
    scalars (one joint solve) in joint mode.
    """

    params: list
    cost: jax.Array
    iterations: jax.Array
    converged: jax.Array
    status: jax.Array


def optimize_batch(problems: Sequence[se.SplineProblem],
                   params0_list: Sequence[dict],
                   flags: frozenset = se.DEFAULT_FLAGS,
                   config: lm.LMConfig | None = None,
                   mode: str = "independent",
                   shared: Sequence[str] = DEFAULT_SHARED,
                   obs_chunk: int = 2048, imu_chunk: int = 256) -> BatchResult:
    """Calibrate N sequences in one compiled batched solve (see module doc).

    Reference analog: none — the reference runs its per-dataset pipeline
    once per recording (python/run_gopro_calibration.py) with no way to
    share rig parameters across recordings.
    """
    if mode not in ("independent", "joint"):
        raise ValueError(f"unknown mode {mode!r}")
    batch = build_sequence_batch(problems, obs_chunk, imu_chunk)
    layout = se.build_layout(batch.p_ref)
    lin = se.make_fast_linearizer(batch.p_ref, layout, batch.plans,
                                  include_prior=False)
    cost = make_batch_cost(batch.p_ref)
    params_b = stack_params(batch, params0_list)
    masks = _batch_masks(batch, layout, flags)
    cfg = config or lm.LMConfig(max_iters=50, ftol=1e-4)
    # Host-static chunk geometry stays a closure constant under vmap (the
    # linearizer then uses the scatter-free static accumulation); only the
    # per-sequence scalar overrides are vmapped.
    static_bases = {k: v for k, v in batch.bases.items()
                    if isinstance(v, np.ndarray)}
    scal_b = {k: v for k, v in batch.bases.items()
              if k not in static_bases}

    if mode == "independent":
        @jax.jit
        def run(prm_b, arrs, sc_b, mask_b):
            return jax.vmap(
                lambda prm, ar, sc, mask: lm.lm_optimize(
                    lambda q: lin(q, ar, {**static_bases, **sc}),
                    lambda q: cost(q, ar, {**static_bases, **sc}),
                    layout.retract, prm, mask, cfg)
            )(prm_b, arrs, sc_b, mask_b)

        res = run(params_b, batch.arrs, scal_b, masks)
        return BatchResult(params=unstack_params(batch, res.params),
                           cost=res.cost, iterations=res.iterations,
                           converged=res.converged, status=res.status)

    # --- joint mode: one scalar LM over the arrowhead system ---
    for name in shared:
        if name not in layout.by_name:
            raise ValueError(f"unknown shared block {name!r}")
    solve_fn = make_arrowhead_solver(layout, shared)

    def linearize_joint(prm_b):
        H_b, g_b, costs = jax.vmap(
            lambda prm, ar, sc: lin(prm, ar, {**static_bases, **sc}))(
                prm_b, batch.arrs, scal_b)
        return H_b, g_b, jnp.sum(costs)

    def cost_joint(prm_b):
        return jnp.sum(jax.vmap(
            lambda prm, ar, sc: cost(prm, ar, {**static_bases, **sc}))(
                prm_b, batch.arrs, scal_b))

    def mask_joint(H_b, g_b, mask_b):
        Hm, gm = jax.vmap(
            lambda H, g, m: (H * m[:, None] * m[None, :] + jnp.diag(1.0 - m),
                             g * m))(H_b, g_b, mask_b.astype(g_b.dtype))
        return Hm, gm

    retract_b = jax.vmap(layout.retract)

    @jax.jit
    def run_joint(prm_b, mask_b):
        return lm.lm_optimize(linearize_joint, cost_joint, retract_b, prm_b,
                              mask_b, cfg, solve_fn=solve_fn,
                              mask_fn=mask_joint)

    res = run_joint(params_b, masks)
    return BatchResult(params=unstack_params(batch, res.params),
                       cost=res.cost, iterations=res.iterations,
                       converged=res.converged, status=res.status)
