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

from openimucameracalibrator_tpu import ops, models, solver, core, parallel, utils  # noqa: F401
