"""Multi-host launch: jax.distributed init + per-host measurement loading.

The reference is strictly single-process (SURVEY.md §2.7). This module is
the multi-host entry point for the TPU-native framework (BASELINE.md:
"frames/s and LM-iters/s at 1 chip, 1 host, and N>=2 hosts"):

* :func:`initialize` wires ``jax.distributed`` from explicit arguments or
  the standard TPU-pod environment (it is a no-op on a single host, so
  every CLI can call it unconditionally).
* :func:`global_mesh` builds a mesh over ALL devices of the pod slice;
  the data axis spans hosts, so the psum/psum-reduced normal equations of
  parallel/sharded.py and the separator reduction of parallel/schur.py
  ride ICI within a host and DCN across hosts unchanged — shard_map code
  is identical for 1 and N hosts.
* :func:`host_shard` / :func:`make_global_problem` implement per-host
  data loading: each host reads ONLY its contiguous time-slice of the
  measurement arrays (e.g. its video segment's corners + IMU span) and
  the global on-device arrays are assembled with
  ``jax.make_array_from_process_local_data`` — no host ever materializes
  the full recording.

Single-host CI cannot exercise true N>2-process launches; correctness of
the collective math is covered by the 8-virtual-device tests
(tests/test_sharded.py, tests/test_schur.py), and this module's slicing
logic is unit-tested host-side (tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openimucameracalibrator_tpu.core import spline_estimator as se


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host pod slice.

    No-op (returns False) when launched single-host with no coordinator —
    so drivers can call this unconditionally. With arguments (or the
    standard cloud TPU environment variables that
    ``jax.distributed.initialize`` auto-detects), joins the pod.
    """
    import os
    auto = any(k in os.environ for k in
               ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not auto:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) slice."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_time_range(t_lo: float, t_hi: float,
                    process_id: int | None = None,
                    num_processes: int | None = None) -> tuple:
    """Contiguous time slice [lo, hi) owned by this host.

    Time (not index) partitioning keeps every host's knot windows local —
    the same property the knot-sharded Schur solver relies on.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    span = (t_hi - t_lo) / n
    return t_lo + pid * span, t_hi if pid == n - 1 else t_lo + (pid + 1) * span


def host_shard(times: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Boolean mask of the samples this host loads (times sorted)."""
    t = np.asarray(times)
    return (t >= lo) & (t < hi)


def make_global_array(local_rows: np.ndarray, mesh: Mesh,
                      axis: str = "data") -> jax.Array:
    """Assemble a global leading-axis-sharded array from per-host rows.

    Each process passes ONLY its own rows (its time slice, padded by the
    caller to the common per-host length); the result is one global jax
    Array sharded over the mesh without any host holding the full data.
    On a single host this degenerates to a device_put with sharding.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_rows), sharding)
    global_shape = (local_rows.shape[0] * jax.process_count(),) \
        + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows), global_shape)


def pad_rows(x: np.ndarray, target: int, pad_value=0) -> np.ndarray:
    out = np.full((target,) + x.shape[1:], pad_value, dtype=x.dtype)
    out[:x.shape[0]] = x
    return out


def _fam_of(field: str) -> str:
    return ("accel" if field.startswith("accel")
            else "gyro" if field.startswith("gyro") else "obs")


def agree_per_host_rows(local: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Cross-host agreement on the common per-host row count per family.

    Each host's time slice holds a different number of samples; the
    sharded global arrays need one common per-host length. This gathers
    every host's counts with ``multihost_utils.process_allgather`` (a real
    collective over the jax.distributed coordination backend — no
    out-of-band channel) and returns the per-family max. Single-process:
    this host's own counts.
    """
    fams = sorted({_fam_of(f) for f in local})
    counts = {fam: max((v.shape[0] for f, v in local.items()
                        if _fam_of(f) == fam), default=0) for fam in fams}
    if jax.process_count() == 1:
        return counts
    from jax.experimental import multihost_utils

    vec = np.asarray([counts[fam] for fam in fams], np.int64)
    all_counts = np.asarray(multihost_utils.process_allgather(vec))
    return {fam: int(all_counts[:, i].max()) for i, fam in enumerate(fams)}


def make_global_problem(local: Dict[str, np.ndarray], meta: Dict,
                        mesh: Mesh, axis: str = "data",
                        per_host_rows: Dict[str, int] | None = None
                        ) -> se.SplineProblem:
    """Build a SplineProblem whose measurement arrays are globally sharded
    from per-host loaded slices.

    ``local``: this host's measurement rows (accel_t/accel_meas/...,
    gyro_*, obs_*) for ITS time slice only, with *_valid marking real
    rows. ``meta``: the static SplineProblem fields (t0, dt_*, n_*,
    w_accel, w_gyro, cam_params, model_name, rolling_shutter).
    ``per_host_rows``: common per-host row count per family; when omitted
    it is agreed across hosts via :func:`agree_per_host_rows` (process
    allgather of the per-family counts, padded to the max).
    """
    if per_host_rows is None:
        per_host_rows = agree_per_host_rows(local)
    arrays = {}
    for f, v in local.items():
        target = per_host_rows.get(_fam_of(f), v.shape[0])
        pad_value = False if f.endswith("_valid") else 0
        padded = pad_rows(np.asarray(v), target, pad_value)
        arrays[f] = make_global_array(padded, mesh, axis)
    return se.SplineProblem(**meta, **arrays)
