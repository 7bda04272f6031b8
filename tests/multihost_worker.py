"""Worker for the true 2-process multihost test (launched by
tests/test_multihost.py::test_two_process_distributed_solve).

Each process joins a jax.distributed pod over a localhost coordinator,
loads ONLY its time slice of the measurements (multihost.host_time_range /
host_shard), agrees per-host row counts with a real process allgather
(multihost.agree_per_host_rows), assembles the globally-sharded problem
(multihost.make_global_problem) and runs the data-parallel sharded LM over
the 2-device global CPU mesh — cross-process psum of the normal equations
rides Gloo. The result is asserted against the local single-device solve
of the SAME full problem, in-process.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.setdefault("OICC_TPU_DISABLE_JIT_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc  # one CPU device per process

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge  # noqa: E402
from openimucameracalibrator_tpu.core import spline_estimator as se  # noqa: E402
from openimucameracalibrator_tpu.parallel import multihost, sharded  # noqa: E402
from openimucameracalibrator_tpu.solver import lm  # noqa: E402

# Deterministic tiny problem — every host could derive this from the
# recording metadata; measurement VALUES are only read slice-wise below.
p_full, params0 = ge._tiny_problem()

# --- per-host loading: this host materializes only its time slice ---
t_lo = float(min(p_full.accel_t.min(), p_full.obs_t.min()))
t_hi = float(max(p_full.accel_t.max(), p_full.obs_t.max())) + 1e-6
lo, hi = multihost.host_time_range(t_lo, t_hi)
local = {}
for fam, tkey in (("accel", "accel_t"), ("gyro", "gyro_t"), ("obs", "obs_t")):
    m = multihost.host_shard(np.asarray(getattr(p_full, tkey)), lo, hi)
    for f in se.SplineProblem._fields:
        if f.startswith(fam) and getattr(p_full, f) is not None \
                and not isinstance(getattr(p_full, f), (int, float, str, bool)):
            local[f] = np.asarray(getattr(p_full, f))[m]

meta = {f: getattr(p_full, f) for f in
        ("t0", "dt_so3", "dt_r3", "dt_bias", "n_so3", "n_r3", "n_bias",
         "w_accel", "w_gyro", "cam_params", "model_name", "rolling_shutter")}

rows = multihost.agree_per_host_rows(local)  # REAL cross-process allgather
mesh = multihost.global_mesh()
p_global = multihost.make_global_problem(local, meta, mesh,
                                         per_host_rows=rows)

cfg = lm.LMConfig(max_iters=3, ftol=0.0)
flags = se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY, se.TIME_OFFSET}
res = sharded.optimize_sharded(p_global, params0, mesh, flags=flags,
                               config=cfg, method="scatter")
cost_sh = float(res.cost)

# Reference: single-device solve of the full problem in this process.
ref = se.optimize(p_full, params0, flags=flags, config=cfg, method="scatter")
cost_ref = float(ref.cost)

assert np.isfinite(cost_sh)
rel = abs(cost_sh - cost_ref) / max(abs(cost_ref), 1e-12)
assert rel < 1e-3, (cost_sh, cost_ref)
t_sh = np.asarray(res.params["t_r3"])
t_ref = np.asarray(ref.params["t_r3"])
# f32 psum reduction order differs from the single-device sum; over 3 LM
# iterations the trajectories drift at the ~1e-4 level (measured 3.7e-4).
assert np.max(np.abs(t_sh - t_ref)) < 2e-3, np.max(np.abs(t_sh - t_ref))

print(f"OK pid={pid} cost={cost_sh:.8e} ref={cost_ref:.8e}", flush=True)
