"""Motion-only bundle adjustment (frame pose vs. fixed map).

Replaces the reference's ``Optimizer::PoseOptimization`` (canonical
``src/Optimizer.cc`` — SURVEY.md §2.1): unary SE3-projection edges with
Huber robustification, run as 4 rounds of 10 LM iterations with chi2
inlier re-classification between rounds. Here the whole solve is one jitted
call: residuals/Jacobians for every observation at once (analytic, from
``geometry.project_jacobians``), 6x6 normal equations by a masked reduction,
and the damped-LM accept/reject loop from ``lm.py``.

Observations are weighted by the detection octave's scale variance
(sigma2 = scale_factor^(2*octave)), as in the reference's invSigma2 tables.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry as geo
from .lm import huber_weight, lm_loop


class PoseOptResult(NamedTuple):
    R: jax.Array         # f32[3, 3]
    t: jax.Array         # f32[3]
    inlier: jax.Array    # bool[N] final chi2 classification
    n_inliers: jax.Array # i32
    cost: jax.Array      # f32 final robust cost


def _system(R, t, X, uv, w_obs, valid, fx, fy, cx, cy, delta2):
    """Robust cost + 6x6 normal equations for all observations at once."""
    uv_hat, z, J_pose, _ = geo.project_jacobians(R, t, X, fx, fy, cx, cy)
    r = uv_hat - uv                                  # [N, 2]
    ok = valid & (z > 1e-3)
    chi2 = jnp.sum(r * r, -1) * w_obs                # scale-weighted squared err
    w_rob = huber_weight(chi2, delta2)
    w = jnp.where(ok, w_obs * w_rob, 0.0)            # [N]
    cost = jnp.sum(
        jnp.where(
            ok,
            jnp.where(
                chi2 <= delta2,
                chi2,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
            ),
            0.0,
        )
    )
    H = jnp.einsum("nki,n,nkj->ij", J_pose, w, J_pose)
    g = jnp.einsum("nki,n,nk->i", J_pose, w, r)
    return cost, H, g


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization(
    R0: jax.Array,
    t0: jax.Array,
    X: jax.Array,        # f32[N, 3] world points
    uv: jax.Array,       # f32[N, 2] observed pixels
    inv_sigma2: jax.Array,  # f32[N] per-observation information (1/sigma^2)
    valid: jax.Array,    # bool[N]
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    chi2_th: float = 5.991,
    rounds: int = 4,
    iters: int = 10,
) -> PoseOptResult:
    """Optimize T_cw against fixed 3D points; returns pose + inlier set."""

    def classify(R, t, inlier):
        uv_hat, z, _, _ = geo.project_jacobians(R, t, X, fx, fy, cx, cy)
        chi2 = jnp.sum((uv_hat - uv) ** 2, -1) * inv_sigma2
        return valid & (z > 1e-3) & (chi2 <= chi2_th)

    R0 = geo.orthogonalize(R0)

    def one_round(carry, _):
        R, t, inlier = carry
        R = geo.orthogonalize(R)

        def cas(x):
            Rx, tx = x
            return _system(
                Rx, tx, X, uv, inv_sigma2, inlier, fx, fy, cx, cy, chi2_th
            )

        def retract(x, dx):
            Rx, tx = x
            return geo.se3_retract(Rx, tx, dx)

        (R, t), cost = lm_loop(cas, retract, (R, t), iters)
        inlier = classify(R, t, valid)
        return (R, t, inlier), cost

    init = (R0, t0, valid)
    (R, t, inlier), costs = jax.lax.scan(one_round, init, jnp.arange(rounds))
    return PoseOptResult(
        R=R,
        t=t,
        inlier=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        cost=costs[-1],
    )
