from openimucameracalibrator_tpu.ops import lie, spline  # noqa: F401
