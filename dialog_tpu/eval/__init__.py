"""Trajectory evaluation + benchmark harness.

The reference relies on external tools for accuracy evaluation (TUM
benchmark ``evaluate_ate.py`` / KITTI devkit — SURVEY.md §4); here the
evaluators are built in, since the driver metric (BASELINE.json) requires
ATE RMSE + fps reporting as first-class outputs.
"""

from .ate import ate_rmse, align_umeyama  # noqa: F401
