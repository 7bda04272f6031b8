"""TPU-native calibration-target detection.

Replaces the reference's OpenCV/ethz-apriltag detection stack
(/root/reference src/core/board_extractor.cc:127-243) with an in-house
pipeline: JAX kernels for the pixel-heavy stages (adaptive threshold,
corner response, subpixel refinement, marker-bit sampling) and small
host-side graph logic for the irregular stages (connected components,
quad extraction).
"""

from openimucameracalibrator_tpu.detect.aruco_dict import (ArucoDictionary,
                                                           aruco_original_dictionary)
from openimucameracalibrator_tpu.detect.render import (render_charuco_board,
                                                       render_checkerboard,
                                                       render_marker)
