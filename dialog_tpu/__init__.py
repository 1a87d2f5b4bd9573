"""dialog_tpu: a TPU-native sparse visual SLAM / SfM engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the classical
C++ pipeline represented by the reference repo czh55/Dialog (ORB-SLAM2-family;
see SURVEY.md): FAST/ORB frontend, descriptor matching, two-view
initialization, PnP tracking + relocalization, covisibility-windowed bundle
adjustment, and loop closing with Sim3 pose-graph optimization, for monocular,
stereo, and RGB-D sensors.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to one-pass bf16 (~1e-3 relative error), which is fatal
# for pose math: rotation chains drift off SO(3) and the Schur reduction loses
# the curvature signal BA converges on. This engine is HBM/transfer-bound, not
# MXU-bound (KERNELS.md), so exact-f32 matmuls cost nothing measurable; ops
# that genuinely tolerate bf16 opt in locally via precision=... instead.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import EngineConfig, Sensor  # noqa: F401
from .containers import FrameArrays, KeyframeStore, LandmarkStore, MapState  # noqa: F401
