"""Device-resident optimization: the engine's replacement for g2o.

The reference delegates all nonlinear least squares to the g2o sparse-graph
Levenberg-Marquardt stack (canonical ``Thirdparty/g2o``, driven from
``src/Optimizer.cc`` — SURVEY.md §2.2). Here every solver is a pure jitted
function over fixed-capacity arrays: analytic Jacobians, robust Huber
weights, damped normal equations, and (for BA) blocked Schur complement
reduction, with `jax.jacfwd` versions kept in tests as oracles.
"""

from .pose_only import pose_optimization  # noqa: F401
