import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.ops import lie
from openimucameracalibrator_tpu.solver import blocks, lm, robust


def test_lm_quadratic_converges():
    """Simple nonlinear least squares: Rosenbrock-style residuals."""
    layout = blocks.BlockLayout([blocks.BlockSpec("x", (2,))])

    def residual(params):
        x = params["x"]
        return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    params0 = {"x": jnp.array([-1.2, 1.0])}
    res = lm.lm_optimize(lin, cost, retract, params0, layout.free_mask(),
                         lm.LMConfig(max_iters=100, ftol=1e-14))
    np.testing.assert_allclose(np.asarray(res.params["x"]), [1.0, 1.0], atol=1e-6)


def test_lm_quaternion_manifold_rotation_fit(rng):
    """Fit a rotation aligning point sets: exercises quat retraction."""
    q_true = rng.normal(size=4)
    q_true /= np.linalg.norm(q_true)
    pts = rng.normal(size=(50, 3))
    obs = np.array(lie.quat_rotate(jnp.array(q_true), jnp.array(pts)))
    obs += rng.normal(size=obs.shape) * 1e-6

    layout = blocks.BlockLayout([blocks.BlockSpec("q", (4,), "quat")])

    def residual(params):
        pred = lie.quat_rotate(params["q"], jnp.array(pts))
        return (pred - jnp.array(obs)).reshape(-1)

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    params0 = {"q": lie.quat_identity(jnp.float64)}
    res = lm.lm_optimize(lin, cost, retract, params0, layout.free_mask(),
                         lm.LMConfig(max_iters=60))
    got = np.asarray(res.params["q"])
    err = np.linalg.norm(np.asarray(lie.quat_boxminus(jnp.array(got), jnp.array(q_true))))
    assert err < 1e-5
    # Result stays a unit quaternion.
    np.testing.assert_allclose(np.linalg.norm(got), 1.0, atol=1e-9)


def test_lm_fixed_block_mask(rng):
    layout = blocks.BlockLayout([blocks.BlockSpec("a", (2,)), blocks.BlockSpec("b", (2,))])

    def residual(params):
        return jnp.concatenate([params["a"] - 3.0, params["b"] - 5.0])

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    p0 = {"a": jnp.zeros(2), "b": jnp.zeros(2)}
    res = lm.lm_optimize(lin, cost, retract, p0, layout.free_mask(fixed=["b"]))
    np.testing.assert_allclose(np.asarray(res.params["a"]), [3.0, 3.0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.params["b"]), [0.0, 0.0], atol=1e-12)


def test_lm_huber_outlier_resistance(rng):
    """Line fit with 20% gross outliers: Huber keeps the true model."""
    true_ab = np.array([2.0, -1.0])
    x = rng.uniform(-1, 1, 200)
    y = true_ab[0] * x + true_ab[1] + rng.normal(size=200) * 0.01
    outliers = rng.choice(200, 40, replace=False)
    y[outliers] += rng.normal(size=40) * 20.0

    layout = blocks.BlockLayout([blocks.BlockSpec("ab", (2,))])

    def residual(params):
        a, b = params["ab"][0], params["ab"][1]
        return a * jnp.array(x) + b - jnp.array(y)

    wfn = lambda r: robust.huber_sqrt_weights(r, delta=0.05)
    lin, cost, retract = lm.make_dense_linearizer(residual, layout, weight_fn=wfn)
    res = lm.lm_optimize(lin, cost, retract, {"ab": jnp.zeros(2)}, layout.free_mask(),
                         lm.LMConfig(max_iters=100))
    np.testing.assert_allclose(np.asarray(res.params["ab"]), true_ab, atol=5e-3)


def test_lm_jit_once():
    """The whole optimize call compiles as one function."""
    layout = blocks.BlockLayout([blocks.BlockSpec("x", (3,))])

    def residual(params):
        return params["x"] - jnp.array([1.0, 2.0, 3.0])

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)

    @jax.jit
    def solve(x0):
        return lm.lm_optimize(lin, cost, retract, {"x": x0}, layout.free_mask()).params["x"]

    out = solve(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), [1, 2, 3], atol=1e-8)


def test_lm_fused_strategy_converges():
    """strategy="fused" (trial cost from linearize-at-candidate + Nielsen
    gain-ratio damping) reaches the same optimum as classic, honors fixed
    blocks, and keeps manifold blocks on-manifold."""
    layout = blocks.BlockLayout([blocks.BlockSpec("x", (2,))])

    def residual(params):
        x = params["x"]
        return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    params0 = {"x": jnp.array([-1.2, 1.0])}
    res = lm.lm_optimize(lin, cost, retract, params0, layout.free_mask(),
                         lm.LMConfig(max_iters=100, ftol=1e-14),
                         strategy="fused")
    np.testing.assert_allclose(np.asarray(res.params["x"]), [1.0, 1.0],
                               atol=1e-6)
    # Monotone recorded cost trace.
    hist = np.asarray(res.cost_history[: int(res.iterations)])
    assert np.all(np.diff(hist) <= 1e-12)


def test_lm_fused_quaternion_and_fixed(rng):
    q_true = rng.normal(size=4)
    q_true /= np.linalg.norm(q_true)
    pts = rng.normal(size=(30, 3))
    obs = np.array(lie.quat_rotate(jnp.array(q_true), jnp.array(pts)))

    layout = blocks.BlockLayout([blocks.BlockSpec("q", (4,), "quat"),
                                 blocks.BlockSpec("b", (3,))])

    def residual(params):
        pred = lie.quat_rotate(params["q"], jnp.array(pts)) + params["b"]
        return (pred - jnp.array(obs)).reshape(-1)

    lin, cost, retract = lm.make_dense_linearizer(residual, layout)
    p0 = {"q": lie.quat_identity(jnp.float64), "b": jnp.zeros(3)}
    res = lm.lm_optimize(lin, cost, retract, p0,
                         layout.free_mask(fixed=["b"]),
                         lm.LMConfig(max_iters=60), strategy="fused")
    got = np.asarray(res.params["q"])
    err = np.linalg.norm(np.asarray(lie.quat_boxminus(jnp.array(got),
                                                      jnp.array(q_true))))
    assert err < 1e-5
    np.testing.assert_allclose(np.linalg.norm(got), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.params["b"]), 0.0, atol=1e-12)
