"""OpenImuCameraCalibrator-TPU: a TPU-native IMU+camera calibration and SfM engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
urbste/OpenImuCameraCalibrator (reference: /root/reference): camera intrinsic
calibration across seven camera models, board corner detection, IMU-camera
rotation/time-offset initialization, continuous-time B-spline batch
calibration with rolling-shutter support, static multi-pose IMU intrinsic
calibration, and Allan-variance noise characterization.

Unlike the reference (a single-process CPU pipeline over Ceres/TheiaSfM/
OpenCV), everything numeric here is batched JAX: camera models are pure
``project``/``unproject`` functions, the solver is a dense-block
Levenberg-Marquardt with tangent-space retractions, and the continuous-time
problem is assembled as statically-shaped residual batches (each B-spline
measurement touches a fixed window of knots) that shard over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"


def enable_persistent_jit_cache():
    """Point JAX's persistent compilation cache at a per-user directory.

    The continuous-time batch problem compiles multi-minute XLA programs;
    caching them across processes turns every rerun of the CLI pipeline /
    bench into a warm start. Called by the CLI entry points (apps/*) and
    bench — NOT at package import, so importing the library has no
    filesystem or jax-import side effects. Opt out with
    ``OICC_TPU_DISABLE_JIT_CACHE=1`` or by setting your own
    ``jax_compilation_cache_dir`` first (we never override one).
    (jax 0.9.0 ignores the JAX_COMPILATION_CACHE_DIR env var, so this must
    be a config update.)
    """
    import os

    if os.environ.get("OICC_TPU_DISABLE_JIT_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "openimucameracalibrator_tpu", "jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except (OSError, AttributeError):  # read-only home / older jax: skip
        pass


from openimucameracalibrator_tpu import ops, models, solver, core, parallel, utils  # noqa: E402,F401
