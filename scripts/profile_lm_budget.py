"""Measure the DS3-scale per-LM-iteration budget on the live device.

Reports steady-state times for linearize / solve / cost_eval separately,
then runs an instrumented copy of the LM loop that counts inner trials, so
the 133 ms/iter budget (VERDICT r4 weak #1) can be attributed precisely.

Usage: python scripts/profile_lm_budget.py [--iters 30]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
import openimucameracalibrator_tpu as oicc  # noqa: E402

oicc.enable_persistent_jit_cache()
from openimucameracalibrator_tpu.core import spline_estimator as se  # noqa: E402
from openimucameracalibrator_tpu.solver import lm  # noqa: E402


def timed(fn, *a, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    dtype = jnp.float32
    prob, params0, _, _ = bench.build_ds3_problem(dtype)
    layout = se.build_layout(prob)
    lin, cost = se.make_solver_functions_fast(prob, layout)
    flags = se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY, se.TIME_OFFSET}
    mask = layout.free_mask(fixed=se.flags_to_fixed(flags))

    jlin = jax.jit(lin)
    jcost = jax.jit(cost)
    t_lin, (H, g, c0) = timed(jlin, params0)
    t_cost, _ = timed(jcost, params0)
    jsolve = jax.jit(lambda H, g: lm._solve_damped(H, g, 1e-4))
    t_solve, _ = timed(jsolve, H, g)
    jretract = jax.jit(layout.retract)
    delta = jnp.zeros((layout.tangent_dim,), dtype)
    t_retract, _ = timed(jretract, params0, delta)
    print(f"D={layout.tangent_dim}")
    print(f"steady linearize_ms {t_lin*1e3:8.2f}")
    print(f"steady cost_ms      {t_cost*1e3:8.2f}")
    print(f"steady solve_ms     {t_solve*1e3:8.2f}")
    print(f"steady retract_ms   {t_retract*1e3:8.2f}")

    # Instrumented LM: count total inner trials across the run.
    cfg = lm.LMConfig(max_iters=args.iters, ftol=1e-10)  # no early stop

    @jax.jit
    def run_counted(params0):
        def outer_cond(s):
            _, _, _, it, trials = s
            return it < cfg.max_iters

        def outer_body(s):
            params, cost_c, lam, it, trials = s
            H, g, cost_lin = lin(params)
            Hm, gm = lm._mask_system(H, g, mask.astype(g.dtype))

            def inner_cond(t):
                _, _, _, acc, k = t
                return (~acc) & (k < cfg.max_inner)

            def inner_body(t):
                bp, bc, lam_i, _, k = t
                d = lm._solve_damped(Hm, gm, lam_i) * mask.astype(g.dtype)
                cand = layout.retract(params, d)
                cc = cost(cand)
                good = jnp.isfinite(cc) & (cc < cost_lin)
                nl = jnp.where(good, jnp.maximum(lam_i / 3.0, 1e-12),
                               jnp.minimum(lam_i * 4.0, 1e10))
                op = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(good, b, a), bp, cand)
                return op, jnp.where(good, cc, bc), nl, good, k + 1

            init = (params, cost_lin, lam, jnp.asarray(False), jnp.asarray(0))
            np_, nc, nlam, acc, k = jax.lax.while_loop(
                inner_cond, inner_body, init)
            return np_, nc, nlam, it + 1, trials + k

        c0 = cost(params0)
        s = (params0, c0, jnp.asarray(1e-4, dtype), jnp.asarray(0),
             jnp.asarray(0))
        params, cost_f, lam, it, trials = jax.lax.while_loop(
            outer_cond, outer_body, s)
        return cost_f, it, trials

    cf, it, trials = jax.block_until_ready(run_counted(params0))  # compile
    t0 = time.perf_counter()
    cf, it, trials = jax.block_until_ready(run_counted(params0))
    wall = time.perf_counter() - t0
    it, trials = int(it), int(trials)
    print(f"\nLM run: {it} outer iters, {trials} inner trials "
          f"({trials / max(it,1):.2f}/iter), wall {wall:.3f}s "
          f"-> {it / wall:.2f} iters/s, {wall / it * 1e3:.1f} ms/iter")
    print(f"final cost {float(cf):.1f}")
    exp = t_lin + (trials / max(it, 1)) * (t_solve + t_cost)
    print(f"expected ms/iter from components: {exp*1e3:.1f}")

    # Fused strategy comparison (same iteration budget).
    cfgf = lm.LMConfig(max_iters=args.iters, ftol=1e-10)

    @jax.jit
    def run_fused(prm):
        return lm.lm_optimize(lin, cost, layout.retract, prm, mask, cfgf,
                              strategy="fused")

    res = jax.block_until_ready(run_fused(params0))
    t0 = time.perf_counter()
    res = jax.block_until_ready(run_fused(params0))
    wallf = time.perf_counter() - t0
    itf = int(res.iterations)
    print(f"\nfused LM: {itf} iters, wall {wallf:.3f}s -> "
          f"{itf / wallf:.2f} iters/s, {wallf / itf * 1e3:.1f} ms/iter")
    print(f"final cost {float(res.cost):.1f} "
          f"(status {lm.STATUS_NAMES[int(res.status)]})")
    hist = [float(h) for h in res.cost_history[:itf]]
    print("cost trace:", " ".join(f"{h:.0f}" for h in hist[:20]))

    # Fused + bf16 Gram accumulation.
    lin16, cost16 = se.make_solver_functions_fast(prob, layout,
                                                  gram_dtype=jnp.bfloat16)

    @jax.jit
    def run_fused16(prm):
        return lm.lm_optimize(lin16, cost16, layout.retract, prm, mask, cfgf,
                              strategy="fused")

    res = jax.block_until_ready(run_fused16(params0))
    t0 = time.perf_counter()
    res = jax.block_until_ready(run_fused16(params0))
    wallf = time.perf_counter() - t0
    itf = int(res.iterations)
    print(f"\nfused+bf16gram LM: {itf} iters, wall {wallf:.3f}s -> "
          f"{itf / wallf:.2f} iters/s, {wallf / itf * 1e3:.1f} ms/iter")
    print(f"final cost {float(res.cost):.1f} "
          f"(status {lm.STATUS_NAMES[int(res.status)]})")
    hist = [float(h) for h in res.cost_history[:itf]]
    print("cost trace:", " ".join(f"{h:.0f}" for h in hist[:20]))


if __name__ == "__main__":
    main()
