"""Attribute the schur-vs-data-parallel gap on the virtual CPU mesh.

VERDICT r4 weak #3 / next #5: at the bench scaling config (12 s recording,
8 virtual devices on 2 cores) the knot-sharded Schur path measured 2.4x
slower than data-parallel. This script separates the per-iteration costs
(linearize vs damped solve vs cost eval) for both paths at configurable
problem scale, so the gap can be attributed and the compute-bound regime
(longer recordings) measured.

Usage: python scripts/profile_schur.py [--duration 12] [--n 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *a, n=3):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=12.0)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.n}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from openimucameracalibrator_tpu.core import spline_estimator as se
    from openimucameracalibrator_tpu.parallel import schur, sharded
    from openimucameracalibrator_tpu.solver import lm

    problem, params0, _, _ = bench.build_ds3_problem(
        jnp.float32, duration=args.duration, cam_fps=30.0, imu_rate=100.0)
    layout = se.build_layout(problem)
    print(f"D={layout.tangent_dim} duration={args.duration}s n={args.n}")
    flags_ = se.DEFAULT_FLAGS
    mask = layout.free_mask(fixed=se.flags_to_fixed(flags_))
    mesh = sharded.make_mesh(args.n)

    # --- data-parallel components ---
    lin_dp, cost_dp, _ = sharded.make_sharded_solver_functions(problem, mesh)
    jlin = jax.jit(lin_dp)
    t, (H, g, c) = timed(jlin, params0)
    print(f"dp linearize_ms {t*1e3:9.1f}")
    jsolve = jax.jit(lambda H, g: lm._solve_damped(H, g, 1e-4))
    t, _ = timed(jsolve, H, g)
    print(f"dp solve_ms     {t*1e3:9.1f}   (dense chol D={H.shape[0]})")
    jcost = jax.jit(cost_dp)
    t, _ = timed(jcost, params0)
    print(f"dp cost_ms      {t*1e3:9.1f}")

    # --- schur components ---
    lin_s, cost_s, solve_s, layout_s, part = \
        schur.make_schur_solver_functions(problem, mesh, obs_chunk=8192,
                                          imu_chunk=2048)
    print(f"schur partition: m={part.m} S={part.S} "
          f"n_s_loc={part.n_s_loc} n_r_loc={part.n_r_loc}")
    jlin_s = jax.jit(lin_s)
    t, (NE, _, c2) = timed(jlin_s, params0)
    print(f"schur linearize_ms {t*1e3:6.1f}")
    jsolve_s = jax.jit(lambda NE: solve_s(NE, None, jnp.asarray(1e-4, jnp.float32),
                                          mask.astype(jnp.float32)))
    t, _ = timed(jsolve_s, NE)
    print(f"schur solve_ms     {t*1e3:6.1f}   (per-dev m={part.m}, sep S={part.S})")
    jcost_s = jax.jit(cost_s)
    t, _ = timed(jcost_s, params0)
    print(f"schur cost_ms      {t*1e3:6.1f}")

    # --- full LM comparison ---
    cfg = lm.LMConfig(max_iters=args.iters, ftol=0.0)
    res = sharded.optimize_sharded(problem, params0, mesh, flags_, config=cfg,
                                   obs_chunk=4096, imu_chunk=1024)
    jax.block_until_ready(res.cost)
    t0 = time.perf_counter()
    res = sharded.optimize_sharded(problem, params0, mesh, flags_, config=cfg,
                                   obs_chunk=4096, imu_chunk=1024)
    jax.block_until_ready(res.cost)
    dt_dp = time.perf_counter() - t0
    print(f"dp LM: {int(res.iterations)} iters in {dt_dp:.2f}s "
          f"({int(res.iterations)/dt_dp:.3f} it/s) cost {float(res.cost):.1f}")

    res = schur.optimize_schur(problem, params0, mesh, flags_, config=cfg,
                               obs_chunk=8192, imu_chunk=2048)
    jax.block_until_ready(res.cost)
    t0 = time.perf_counter()
    res = schur.optimize_schur(problem, params0, mesh, flags_, config=cfg,
                               obs_chunk=8192, imu_chunk=2048)
    jax.block_until_ready(res.cost)
    dt_s = time.perf_counter() - t0
    print(f"schur LM: {int(res.iterations)} iters in {dt_s:.2f}s "
          f"({int(res.iterations)/dt_s:.3f} it/s) cost {float(res.cost):.1f}")
    print(f"schur/dp wall ratio: {dt_s/dt_dp:.2f}")


if __name__ == "__main__":
    main()
