"""TPU probe: linearize wall time, parallel (vmap) vs sequential (scan).

Measures the DS3-scale linearizer on the real chip across chunk sizes and
prints per-variant best-of-N times + compiler FLOP counts. Run on an IDLE
box (CPU contention inflates dispatch timings) with the TPU free.

Usage: python scripts/probe_linearize.py [--quick]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench: problem builder)
from openimucameracalibrator_tpu.core import spline_estimator as se  # noqa: E402


def best_of(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--obs_chunks", type=str, default="2048,4096,8192")
    ap.add_argument("--imu_chunks", type=str, default="256,1024")
    args = ap.parse_args()

    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()

    print(f"devices: {jax.devices()}")
    problem, params0, corners, imu = bench.build_ds3_problem(jnp.float32)
    layout = se.build_layout(problem)
    print(f"D={layout.tangent_dim} obs={int(np.sum(np.asarray(corners.valid)))} "
          f"imu={len(imu.times)}")

    variants = []
    for oc in [int(x) for x in args.obs_chunks.split(",")]:
        for ic in [int(x) for x in args.imu_chunks.split(",")]:
            variants.append(("par", oc, ic, False))
    variants.append(("seq", 2048, 256, True))
    if args.quick:
        variants = variants[:1] + variants[-1:]

    for tag, oc, ic, sequential in variants:
        plans, arrs = se.plan_fast_assembly(problem, obs_chunk=oc, imu_chunk=ic)
        lin = se.make_fast_linearizer(problem, layout, plans,
                                      sequential=sequential)
        bases = se.plan_bases(plans)
        jl = jax.jit(lambda prm: lin(prm, arrs, bases))
        t0 = time.perf_counter()
        try:
            t, out = best_of(jl, params0)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} obs={oc} imu={ic}: FAILED {type(e).__name__}: {e}")
            continue
        compile_s = time.perf_counter() - t0 - t
        H, g, cost = out
        flops = None
        try:
            ca = jl.lower(params0).compile().cost_analysis()
            flops = float((ca or {}).get("flops", 0.0))
        except Exception:
            pass
        gf = f" {flops / 1e9:.2f} GFLOP, {flops / t / 1e12:.3f} TFLOPS" \
            if flops else ""
        print(f"{tag} obs={oc} imu={ic}: {t * 1e3:8.2f} ms "
              f"(compile ~{compile_s:.0f}s) cost={float(cost):.1f}"
              f" |H|={float(jnp.abs(H).sum()):.3e}{gf}")


if __name__ == "__main__":
    main()
