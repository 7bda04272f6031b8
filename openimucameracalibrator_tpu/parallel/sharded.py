"""Multi-device sharded solver: measurements over a mesh, psum'd normal equations.

The reference has NO distributed execution of any kind (SURVEY.md §2.7 —
its only parallelism is the Ceres thread pool). This module is the
first-class TPU-native replacement:

* mesh axis ``data``: accelerometer/gyro/reprojection measurement batches
  are sharded along their leading axis; spline knots and calibration
  parameters are replicated (they are a few thousand floats).
* each device assembles the dense normal-equation contribution of its
  measurement shard with the same structured block assembly as the
  single-device path (core/spline_estimator.py), then ``jax.lax.psum``
  over the mesh reduces (H, g, cost) — the collective rides ICI.
* the damped solve + retraction run replicated (H is D x D with D of a
  few thousand; the Cholesky is negligible next to assembly).

This is the continuous-time analog of data parallelism; knot-segment
(model) sharding composes on top by sharding H's rows at larger D (future
work, SURVEY.md §5 halo-exchange note).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openimucameracalibrator_tpu.core import spline_estimator as se
from openimucameracalibrator_tpu.solver import lm

# SplineProblem fields sharded along their leading (measurement) axis.
_SHARDED_FIELDS = ("accel_t", "accel_meas", "accel_valid",
                   "gyro_t", "gyro_meas", "gyro_valid",
                   "obs_t", "obs_row", "obs_uv", "obs_pt", "obs_valid")
_REPLICATED_ARRAY_FIELDS = ("cam_params",)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def _pad_to_multiple(x: jnp.ndarray, n: int, pad_value=0):
    m = x.shape[0]
    target = ((m + n - 1) // n) * n
    if target == m:
        return x
    pad = [(0, target - m)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=pad_value)


def pad_problem(p: se.SplineProblem, n_shards: int) -> se.SplineProblem:
    """Pad each measurement batch to a multiple of the mesh size; padding
    entries carry valid=False so they contribute exactly zero."""
    upd: Dict = {}
    upd["accel_t"] = _pad_to_multiple(p.accel_t, n_shards)
    upd["accel_meas"] = _pad_to_multiple(p.accel_meas, n_shards)
    upd["accel_valid"] = _pad_to_multiple(p.accel_valid, n_shards, False)
    upd["gyro_t"] = _pad_to_multiple(p.gyro_t, n_shards)
    upd["gyro_meas"] = _pad_to_multiple(p.gyro_meas, n_shards)
    upd["gyro_valid"] = _pad_to_multiple(p.gyro_valid, n_shards, False)
    upd["obs_t"] = _pad_to_multiple(p.obs_t, n_shards)
    upd["obs_row"] = _pad_to_multiple(p.obs_row, n_shards)
    upd["obs_uv"] = _pad_to_multiple(p.obs_uv, n_shards)
    upd["obs_pt"] = _pad_to_multiple(p.obs_pt, n_shards)
    upd["obs_valid"] = _pad_to_multiple(p.obs_valid, n_shards, False)
    return p._replace(**upd)


def split_problem(p: se.SplineProblem):
    """(sharded array dict, replicated array dict, static-field dict)."""
    sharded = {f: getattr(p, f) for f in _SHARDED_FIELDS}
    repl = {f: getattr(p, f) for f in _REPLICATED_ARRAY_FIELDS}
    static = {f: getattr(p, f) for f in p._fields
              if f not in _SHARDED_FIELDS and f not in _REPLICATED_ARRAY_FIELDS}
    return sharded, repl, static


def make_sharded_solver_functions(p: se.SplineProblem, mesh: Mesh,
                                  axis: str = "data"):
    """(linearize_fn, cost_fn) with measurement shards on the mesh.

    Same contract as se.make_solver_functions; outputs are replicated.
    """
    n = mesh.shape[axis]
    p = pad_problem(p, n)
    layout = se.build_layout(p)
    sharded, repl, static = split_problem(p)

    shard_spec = {f: P(axis) for f in _SHARDED_FIELDS}
    repl_spec = {f: P() for f in _REPLICATED_ARRAY_FIELDS}

    # Place the data once according to the specs.
    sharded = {f: jax.device_put(v, NamedSharding(mesh, P(axis)))
               for f, v in sharded.items()}
    repl = {f: jax.device_put(v, NamedSharding(mesh, P()))
            for f, v in repl.items()}

    def _rebuild(shard_arrays, repl_arrays):
        return se.SplineProblem(**static, **shard_arrays, **repl_arrays)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), shard_spec, repl_spec),
                       out_specs=(P(), P(), P()))
    def _linearize(params, shard_arrays, repl_arrays):
        p_local = _rebuild(shard_arrays, repl_arrays)
        lin, _ = se.make_solver_functions(p_local, layout)
        H, g, c = lin(params)
        return jax.lax.psum((H, g, c), axis)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), shard_spec, repl_spec),
                       out_specs=P())
    def _cost(params, shard_arrays, repl_arrays):
        p_local = _rebuild(shard_arrays, repl_arrays)
        _, cost = se.make_solver_functions(p_local, layout)
        return jax.lax.psum(cost(params), axis)

    linearize_fn = lambda params: _linearize(params, sharded, repl)
    cost_fn = lambda params: _cost(params, sharded, repl)
    return linearize_fn, cost_fn, layout


def optimize_sharded(p: se.SplineProblem, params0: dict, mesh: Mesh,
                     flags: frozenset = se.DEFAULT_FLAGS,
                     max_iters: int = 50,
                     config: lm.LMConfig | None = None) -> lm.LMResult:
    """LM with mesh-sharded linearization (drop-in for se.optimize)."""
    lin, cost, layout = make_sharded_solver_functions(p, mesh)
    mask = layout.free_mask(fixed=se.flags_to_fixed(flags))
    cfg = config or lm.LMConfig(max_iters=max_iters, ftol=1e-4)
    run = jax.jit(lambda prm: lm.lm_optimize(lin, cost, layout.retract, prm, mask, cfg))
    return run(params0)
