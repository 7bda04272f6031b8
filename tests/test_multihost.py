"""Multi-host launch plumbing (single-process parts).

True N-process launches need N hosts; here we verify the host-side
slicing/assembly logic and that the single-host degenerate path produces
a problem identical to direct construction."""

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.core import spline_estimator as se
from openimucameracalibrator_tpu.parallel import multihost, sharded


def test_initialize_noop_single_host():
    assert multihost.initialize() is False  # no coordinator -> no-op


def test_host_time_range_partitions():
    ranges = [multihost.host_time_range(0.0, 10.0, process_id=i,
                                        num_processes=4) for i in range(4)]
    assert ranges[0][0] == 0.0 and ranges[-1][1] == 10.0
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c  # contiguous, no gap/overlap
    t = np.linspace(0, 9.999, 1000)
    masks = [multihost.host_shard(t, lo, hi) for lo, hi in ranges]
    assert np.all(sum(m.astype(int) for m in masks) == 1)  # exactly one owner


def test_make_global_problem_single_host_roundtrip():
    rng = np.random.default_rng(0)
    ma, mo = 64, 96
    mesh = multihost.global_mesh()
    meta = dict(t0=0.0, dt_so3=0.1, dt_r3=0.1, dt_bias=2.0, n_so3=25,
                n_r3=25, n_bias=4, w_accel=50.0, w_gyro=500.0,
                cam_params=jnp.asarray([437.0, 437.0, 480.0, 270.0]),
                model_name="pinhole", rolling_shutter=False)
    local = dict(
        accel_t=np.linspace(0, 2, ma), accel_meas=rng.normal(size=(ma, 3)),
        accel_valid=np.ones(ma, bool),
        gyro_t=np.linspace(0, 2, ma), gyro_meas=rng.normal(size=(ma, 3)),
        gyro_valid=np.ones(ma, bool),
        obs_t=np.repeat(np.linspace(0, 2, mo // 8), 8),
        obs_row=rng.uniform(0, 540, mo), obs_uv=rng.uniform(0, 500, (mo, 2)),
        obs_pt=rng.uniform(0, 0.3, (mo, 3)), obs_valid=np.ones(mo, bool))
    p = multihost.make_global_problem(local, meta, mesh)
    assert isinstance(p, se.SplineProblem)
    np.testing.assert_array_equal(np.asarray(p.accel_t), local["accel_t"])
    # Arrays carry the mesh sharding (leading axis over 'data').
    assert p.accel_t.sharding.spec == jax.sharding.PartitionSpec("data")
    # Padding to a common per-host row count stays valid-masked.
    p2 = multihost.make_global_problem(local, meta, mesh,
                                       per_host_rows={"accel": 80, "gyro": 80,
                                                      "obs": 120})
    assert p2.accel_t.shape[0] == 80
    assert int(np.asarray(p2.accel_valid).sum()) == ma
