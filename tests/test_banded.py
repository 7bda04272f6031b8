"""Block-tridiagonal + arrowhead solve (solver/banded.py) vs dense.

The spline Hessian's band/arrow structure (SURVEY.md §5; every residual
touches <= ORDER contiguous knots per spline) lets the damped solve run as
a slab-wise scan instead of a dense D^3 Cholesky. These tests pin the
structured solve to the dense reference bit-tight in f64 and check the
LM integration path picks it up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openimucameracalibrator_tpu.core import spline_estimator as se
from openimucameracalibrator_tpu.ops import lie  # noqa: F401 (problem deps)
from openimucameracalibrator_tpu.solver import banded, lm


def _problem(dtype=jnp.float64, dur=8.0, dt_s=0.2, dt_r=0.35,
             ma=300, mo=600):
    rng = np.random.default_rng(0)
    n_s = int(np.ceil(dur / dt_s)) + se.ORDER - 1
    n_r = int(np.ceil(dur / dt_r)) + se.ORDER - 1
    n_b = 2 + se.BIAS_ORDER - 1
    t_meas = np.linspace(0.05, dur - 0.4, ma)
    obs_t = np.repeat(np.linspace(0.05, dur - 0.4, mo // 12), 12)
    p = se.SplineProblem(
        t0=0.0, dt_so3=dt_s, dt_r3=dt_r, dt_bias=4.0, n_so3=n_s, n_r3=n_r,
        n_bias=n_b,
        accel_t=jnp.asarray(t_meas, dtype),
        accel_meas=jnp.asarray(rng.normal(size=(ma, 3)) * 0.1 + [0, 0, 9.81],
                               dtype),
        accel_valid=jnp.ones(ma, bool), w_accel=50.0,
        gyro_t=jnp.asarray(t_meas, dtype),
        gyro_meas=jnp.asarray(rng.normal(size=(ma, 3)) * 0.1, dtype),
        gyro_valid=jnp.ones(ma, bool), w_gyro=500.0,
        obs_t=jnp.asarray(obs_t, dtype),
        obs_row=jnp.asarray(rng.uniform(0, 540, mo), dtype),
        obs_uv=jnp.asarray(rng.uniform(100, 500, (mo, 2)), dtype),
        obs_pt=jnp.asarray(rng.uniform(0, 0.3, (mo, 3)) * [1, 1, 0], dtype),
        obs_valid=jnp.ones(mo, bool),
        cam_params=jnp.asarray([437.0, 437.0, 480.0, 270.0], dtype),
        model_name="pinhole", rolling_shutter=True)
    params = {
        "q_so3": jnp.asarray(np.tile([1.0, 0, 0, 0], (n_s, 1)), dtype),
        "t_r3": jnp.asarray(rng.normal(size=(n_r, 3)) * 0.05 + [0.15, 0.15, 0.8],
                            dtype),
        "bias_a": jnp.zeros((n_b, 3), dtype),
        "bias_g": jnp.zeros((n_b, 3), dtype),
        "gravity": jnp.asarray([0.0, 0.0, 9.81], dtype),
        "q_i_c": jnp.asarray([1.0, 0, 0, 0], dtype),
        "t_i_c": jnp.zeros(3, dtype),
        "line_delay": jnp.asarray([30e-6], dtype),
        "time_offset": jnp.zeros(1, dtype),
        "accl_intr": se.identity_accl_intr(dtype),
        "gyro_intr": se.identity_gyro_intr(dtype),
    }
    return p, params


def test_structure_covers_tangent_space():
    p, _ = _problem()
    layout = se.build_layout(p)
    struct = banded.from_problem(layout, p, se.ORDER)
    assert struct is not None and struct.idx.shape[0] >= 3
    band = set(np.asarray(struct.idx)[np.asarray(struct.valid)].tolist())
    tail = set(np.asarray(struct.tail).tolist())
    assert band.isdisjoint(tail)
    assert len(band) + len(tail) == layout.tangent_dim
    # slab coords are exactly the so3+r3 knot coordinates
    assert len(band) == 3 * (p.n_so3 + p.n_r3)


def test_banded_solve_matches_dense():
    p, params = _problem()
    layout = se.build_layout(p)
    struct = banded.from_problem(layout, p, se.ORDER)
    lin, _ = se.make_solver_functions(p, layout)
    H, g, _ = jax.jit(lin)(params)
    mask = layout.free_mask(
        fixed=se.flags_to_fixed(se.DEFAULT_FLAGS | {se.CAM_LINE_DELAY}))
    Hm, gm = lm._mask_system(H, g, jnp.asarray(mask, H.dtype))
    solve = jax.jit(banded.make_banded_solver(struct))
    for lam in (1e-6, 1e-3, 1.0):
        d_ref = lm._solve_damped(Hm, gm, lam)
        d_band = solve(Hm, gm, lam)
        scale = float(jnp.max(jnp.abs(d_ref)))
        assert float(jnp.max(jnp.abs(d_ref - d_band))) < 1e-8 * max(scale, 1)


def test_optimize_banded_solver_matches_dense():
    p, params = _problem(mo=360, ma=200)
    layout = se.build_layout(p)
    assert banded.from_problem(layout, p, se.ORDER) is not None
    # "auto" picks dense below BANDED_MIN_DIM (measured faster on TPU);
    # force the banded path to pin LM-loop equality.
    assert se.make_solve_fn(p, layout, "auto") is None
    cfg = lm.LMConfig(max_iters=3, ftol=0.0)
    r_band = se.optimize(p, params, config=cfg, method="scatter",
                         solver="banded")
    r_dense = se.optimize(p, params, config=cfg, method="scatter",
                          solver="dense")
    assert np.isclose(float(r_band.cost), float(r_dense.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(r_band.params["t_r3"]),
                               np.asarray(r_dense.params["t_r3"]),
                               rtol=0, atol=1e-7)


def test_short_problem_falls_back_to_dense():
    # 2-second recording: fewer than 3 slabs -> from_problem declines.
    p, params = _problem(dur=2.0, ma=60, mo=120)
    layout = se.build_layout(p)
    assert banded.from_problem(layout, p, se.ORDER) is None
    assert se.make_solve_fn(p, layout, "auto") is None
    with pytest.raises(ValueError):
        se.make_solve_fn(p, layout, "banded")
