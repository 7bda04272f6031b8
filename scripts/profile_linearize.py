"""Capture a jax.profiler trace of the DS3-scale linearize and print the
top device ops by total duration.

Writes the trace under artifacts/profiles/ (committed evidence for the
linearize-time analysis) and prints an aggregated op table parsed from the
perfetto trace json.

Usage: python scripts/profile_linearize.py [--obs_chunk 2048] [--seq]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from openimucameracalibrator_tpu.core import spline_estimator as se  # noqa: E402


def parse_trace(trace_dir):
    """Aggregate device-op durations from the newest perfetto trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace json found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Find TPU op tracks: pid/tid names containing "TPU" and "XLA Ops".
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name",
                                                    "thread_name"):
            key = (e.get("pid"), e.get("tid")) if e["name"] == "thread_name" \
                else (e.get("pid"), None)
            names[key] = e.get("args", {}).get("name", "")
    dur_by_op = defaultdict(float)
    cnt_by_op = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = names.get((e.get("pid"), e.get("tid")), "")
        pname = names.get((e.get("pid"), None), "")
        if "XLA Op" not in tname and "XLA Ops" not in tname:
            continue
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        d = float(e.get("dur", 0.0))
        nm = e.get("name", "?")
        # collapse fusion instance suffixes
        base = nm.split(".")[0]
        dur_by_op[base] += d
        cnt_by_op[base] += 1
        total += d
    print(f"\ntrace: {path}")
    print(f"total device op time: {total / 1e3:.2f} ms "
          f"(across profiled steps)")
    rows = sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:25]
    for nm, d in rows:
        print(f"  {d / 1e3:9.3f} ms  x{cnt_by_op[nm]:<5d} {nm}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs_chunk", type=int, default=2048)
    ap.add_argument("--imu_chunk", type=int, default=256)
    ap.add_argument("--seq", action="store_true")
    ap.add_argument("--out", default="artifacts/profiles/linearize")
    args = ap.parse_args()

    import openimucameracalibrator_tpu as oicc
    oicc.enable_persistent_jit_cache()

    print(f"devices: {jax.devices()}")
    problem, params0, _, _ = bench.build_ds3_problem(jnp.float32)
    layout = se.build_layout(problem)
    plans, arrs = se.plan_fast_assembly(problem, obs_chunk=args.obs_chunk,
                                        imu_chunk=args.imu_chunk)
    lin = se.make_fast_linearizer(problem, layout, plans,
                                  sequential=args.seq)
    bases = se.plan_bases(plans)
    jl = jax.jit(lambda prm: lin(prm, arrs, bases))
    out = jl(params0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jl(params0)
    jax.block_until_ready(out)
    print(f"warm linearize: {(time.perf_counter() - t0) * 1e3:.2f} ms")

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            out = jl(params0)
            jax.block_until_ready(out)
    parse_trace(args.out)


if __name__ == "__main__":
    main()
