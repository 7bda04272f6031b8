"""Sharded-vs-single-device solver equivalence on the 8-device CPU mesh.

The reference has no distributed mode; our correctness bar (SURVEY.md §4)
is that the mesh-sharded normal equations match the single-device ones to
numerical precision, and that the sharded LM produces the same solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.core import (imu_cam_rotation, pose_estimator,
                                              spline_estimator as se)
from openimucameracalibrator_tpu.parallel import sharded
from openimucameracalibrator_tpu.utils.types import SplineWeightingData

from test_spline_estimator import _make_pipeline_inputs


@pytest.fixture(scope="module")
def small_problem():
    scene, ds, calib, imu = _make_pipeline_inputs(duration=3.0, cam_fps=10.0,
                                                  imu_rate=40.0, seed=3)
    sew = SplineWeightingData(dt_so3=0.15, dt_r3=0.15, std_so3=0.002, std_r3=0.02,
                              cam_fps=10.0)
    p = se.build_problem(ds, calib, imu, sew, time_offset=-0.05,
                         rolling_shutter=False)
    poses = pose_estimator.estimate_poses(ds, calib)
    q_i_c0 = np.asarray(scene.q_i_c)
    params0 = se.init_spline_params(poses, q_i_c0, np.asarray(scene.t_i_c), p, imu,
                                    pose_time_offset=-0.05)
    return p, params0


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_normal_equations_match(small_problem):
    """Both sharded assemblies (scatter reference + fast production path)
    must reproduce the single-device normal equations exactly."""
    p, params0 = small_problem
    layout = se.build_layout(p)
    lin_single, cost_single = se.make_solver_functions(p, layout)
    H0, g0, c0 = lin_single(params0)
    scale = max(1.0, float(jnp.max(jnp.abs(H0))))

    mesh = sharded.make_mesh(8)
    lin_sh, cost_sh, layout_sh = sharded.make_sharded_fast_solver_functions(
        p, mesh, obs_chunk=128, imu_chunk=32)
    H1, g1, c1 = lin_sh(params0)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-10)
    np.testing.assert_allclose(float(cost_sh(params0)), float(cost_single(params0)),
                               rtol=1e-12)


def test_sharded_lm_matches_single_device(small_problem):
    p, params0 = small_problem
    flags = frozenset({se.SPLINE, se.T_I_C, se.IMU_BIASES, se.GRAVITY_DIR})
    res_single = se.optimize(p, params0, flags, max_iters=3)
    # 4 devices: equality is device-count independent; the 8-way program
    # is covered by test_sharded_normal_equations_match (compile budget).
    mesh = sharded.make_mesh(4)
    res_sh = sharded.optimize_sharded(p, params0, mesh, flags, max_iters=3,
                                      obs_chunk=128, imu_chunk=32)
    np.testing.assert_allclose(float(res_sh.cost), float(res_single.cost),
                               rtol=1e-6)
    for k in res_single.params:
        np.testing.assert_allclose(np.asarray(res_sh.params[k]),
                                   np.asarray(res_single.params[k]),
                                   rtol=1e-6, atol=1e-8)


def test_sharded_padding_is_neutral(small_problem):
    p, params0 = small_problem
    layout = se.build_layout(p)
    lin_single, _ = se.make_solver_functions(p, layout)
    H0, g0, c0 = lin_single(params0)
    p_pad = sharded.pad_problem(p, 7)  # deliberately awkward multiple
    lin_pad, _ = se.make_solver_functions(p_pad, layout)
    H1, g1, c1 = lin_pad(params0)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-12)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-12)


@pytest.mark.slow
def test_sharded_scatter_reference_path(small_problem):
    """The scatter-based sharded assembly (equivalence-test reference)
    also reproduces the single-device normal equations."""
    p, params0 = small_problem
    layout = se.build_layout(p)
    lin_single, _ = se.make_solver_functions(p, layout)
    H0, g0, c0 = lin_single(params0)
    mesh = sharded.make_mesh(8)
    lin_sh, _, _ = sharded.make_sharded_solver_functions(p, mesh)
    H1, g1, c1 = lin_sh(params0)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-12)


def test_fast_assembly_matches_scatter(small_problem):
    """Chunk-local dense assembly must equal the direct scatter path."""
    p, params0 = small_problem
    layout = se.build_layout(p)
    lin_s, cost_s = se.make_solver_functions(p, layout)
    lin_f, cost_f = se.make_solver_functions_fast(p, layout, obs_chunk=1024,
                                                  imu_chunk=64)
    H0, g0, c0 = lin_s(params0)
    H1, g1, c1 = lin_f(params0)
    scale = max(1.0, float(jnp.max(jnp.abs(H0))))
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-12)
    np.testing.assert_allclose(float(cost_f(params0)), float(cost_s(params0)),
                               rtol=1e-12)


def test_pad_family_distributes_rows_evenly():
    """Every device must receive its contiguous ~m/n row share; the r4
    layout packed all real rows into the first ceil(m/chunk) devices
    whenever m/n < chunk (IMU entirely on device 0 at bench scale),
    idling most of the mesh and degenerating the Schur partition."""
    m, n, chunk = 1200, 8, 2048
    arrs = {"t": np.linspace(0.0, 12.0, m),
            "v": np.ones(m, bool),
            "x": np.arange(m, dtype=np.float64)}
    fam, k = sharded._pad_family(arrs, "t", "v", n, chunk)
    assert fam["t"].shape == (n, k, chunk)
    counts = fam["v"].reshape(n, -1).sum(1)
    assert counts.min() >= m // n, counts          # every device works
    assert counts.max() - counts.min() <= 1, counts
    # each device's real rows are the contiguous global slice
    m_loc = -(-m // n)
    for d in range(n):
        vd = fam["v"][d].reshape(-1)
        xd = fam["x"][d].reshape(-1)[vd]
        np.testing.assert_array_equal(
            xd, np.arange(d * m_loc, min((d + 1) * m_loc, m)))
    # padded times stay inside the device's own window (local knot span)
    for d in range(n):
        td = fam["t"][d].reshape(-1)
        assert td.max() <= arrs["t"][min((d + 1) * m_loc, m) - 1] + 1e-9


def test_effective_chunk_caps_at_shard_size():
    assert sharded._effective_chunk(1200, 8, 2048, quantum=128) == 256
    assert sharded._effective_chunk(100000, 8, 2048) == 2048
    assert sharded._effective_chunk(0, 8, 2048) == 256
