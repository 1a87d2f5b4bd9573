"""dialog_tpu: a TPU-native sparse visual SLAM / SfM engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the classical
C++ pipeline represented by the reference repo czh55/Dialog (ORB-SLAM2-family;
see SURVEY.md): FAST/ORB frontend, descriptor matching, two-view
initialization, PnP tracking + relocalization, covisibility-windowed bundle
adjustment, and loop closing with Sim3 pose-graph optimization, for monocular,
stereo, and RGB-D sensors.
"""

__version__ = "0.1.0"

from .config import EngineConfig, Sensor  # noqa: F401
from .containers import FrameArrays, KeyframeStore, LandmarkStore, MapState  # noqa: F401
