"""Motion-only bundle adjustment (frame pose vs. fixed map).

Replaces the reference's ``Optimizer::PoseOptimization`` (canonical
``src/Optimizer.cc`` — SURVEY.md §2.1): unary SE3-projection edges with
Huber robustification, run as rounds of LM iterations with chi2 inlier
re-classification between rounds. Monocular edges are 2D (u, v); stereo
observations get the 3D (u, v, uR) residual of g2o's
``EdgeStereoSE3ProjectXYZOnlyPose``. The whole solve is one jitted call:
residuals/Jacobians for every observation at once (analytic), 6x6 normal
equations by a masked reduction, and the damped-LM accept/reject loop.

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


def _residual_rows(R, t, X, uv, u_right, fx, fy, cx, cy, bf, use_stereo):
    """Residual rows + Jacobians: r [N, D], J [N, D, 6], D = 2 or 3."""
    if use_stereo:
        uvr_hat, z, J, _ = geo.stereo_project_jacobians(
            R, t, X, fx, fy, cx, cy, bf
        )
        obs = jnp.concatenate([uv, u_right[..., None]], axis=-1)
        r = uvr_hat - obs
        # monocular observations (u_right < 0): mask the third row
        has_ur = u_right >= 0.0
        r = r.at[..., 2].set(jnp.where(has_ur, r[..., 2], 0.0))
        J = J.at[..., 2, :].set(
            jnp.where(has_ur[..., None], J[..., 2, :], 0.0)
        )
        return r, J, z
    uv_hat, z, J, _ = geo.project_jacobians(R, t, X, fx, fy, cx, cy)
    return uv_hat - uv, J, z


def _system(R, t, X, uv, u_right, w_obs, valid, fx, fy, cx, cy, bf, delta2, use_stereo):
    r, J, z = _residual_rows(R, t, X, uv, u_right, fx, fy, cx, cy, bf, use_stereo)
    ok = valid & (z > 1e-3)
    chi2 = jnp.sum(r * r, -1) * w_obs
    w_rob = huber_weight(chi2, delta2)
    w = jnp.where(ok, w_obs * w_rob, 0.0)
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
    H = jnp.einsum("nki,n,nkj->ij", J, w, J)
    g = jnp.einsum("nki,n,nk->i", J, w, r)
    return cost, H, g


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "use_stereo"))
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
    u_right: jax.Array | None = None,   # f32[N]; <0 = monocular observation
    bf: float = 0.0,
    use_stereo: bool = False,
) -> PoseOptResult:
    """Optimize T_cw against fixed 3D points; returns pose + inlier set."""
    if u_right is None:
        u_right = jnp.full(X.shape[:1], -1.0)

    R0 = geo.orthogonalize(R0)

    def classify(R, t, base):
        r, _, z = _residual_rows(
            R, t, X, uv, u_right, fx, fy, cx, cy, bf, use_stereo
        )
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        return base & (z > 1e-3) & (chi2 <= chi2_th)

    def one_round(carry, _):
        R, t, inlier = carry
        R = geo.orthogonalize(R)

        def cas(x):
            Rx, tx = x
            return _system(
                Rx, tx, X, uv, u_right, inv_sigma2, inlier,
                fx, fy, cx, cy, bf, chi2_th, use_stereo,
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
