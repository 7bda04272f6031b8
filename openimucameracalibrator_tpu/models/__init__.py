from openimucameracalibrator_tpu.models import cameras  # noqa: F401
from openimucameracalibrator_tpu.models.cameras import CAMERA_MODELS, get_model  # noqa: F401
