"""Batched PnP RANSAC for relocalization.

Replaces the reference's EPnP solver (canonical ``src/PnPsolver.cc`` —
SURVEY.md §2.1): instead of sequential adaptive RANSAC around the EPnP
control-point machinery, every hypothesis is solved and scored in one
device call (SURVEY.md §7.1 rule 3). The minimal solver is 6-point DLT on
normalized camera coordinates with an SVD-Procrustes projection back onto
SE(3) — cheaper to batch than EPnP's 12x12 eigensystem and equally good as
a RANSAC hypothesis generator, since the winning pose is always refined by
``optim.pose_optimization`` afterwards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PnPResult(NamedTuple):
    success: jax.Array   # bool
    R: jax.Array         # f32[3, 3]
    t: jax.Array         # f32[3]
    inliers: jax.Array   # bool[N]
    n_inliers: jax.Array # i32


def _dlt_pose(X: jax.Array, xn: jax.Array) -> tuple[jax.Array, jax.Array]:
    """6-point DLT: X [..., 6, 3] world, xn [..., 6, 2] normalized coords.

    Returns (R [..., 3, 3], t [..., 3]) with R projected onto SO(3).
    """
    x, y = xn[..., 0], xn[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    Xh = jnp.concatenate([X, ones[..., None]], axis=-1)      # [..., 6, 4]
    r1 = jnp.concatenate(
        [Xh, jnp.zeros_like(Xh), -x[..., None] * Xh], axis=-1
    )  # [..., 6, 12]
    r2 = jnp.concatenate(
        [jnp.zeros_like(Xh), Xh, -y[..., None] * Xh], axis=-1
    )
    A = jnp.concatenate([r1, r2], axis=-2)                   # [..., 12, 12]
    _, _, Vt = jnp.linalg.svd(A)
    p = Vt[..., -1, :]
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :3]
    # fix sign: points must be in front (positive depth for the centroid)
    Xc = jnp.einsum("...ij,...nj->...ni", M, X) + P[..., None, :, 3]
    sign = jnp.sign(jnp.sum(Xc[..., 2], axis=-1))[..., None, None]
    P = P * jnp.where(sign == 0, 1.0, sign)
    M = P[..., :3]
    # scale so that M ~ R: use the mean row norm
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)) + 1e-12)[..., None, None]
    M = M / scale
    t = P[..., 3] / scale[..., 0]
    # Procrustes: closest rotation
    U, _, Vt2 = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt2))
    D = jnp.concatenate(
        [
            jnp.ones(d.shape + (2,)),
            d[..., None],
        ],
        axis=-1,
    )
    R = U @ (D[..., :, None] * Vt2)
    return R, t


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_pnp_ransac(
    X: jax.Array,        # f32[N, 3] world points
    uv: jax.Array,       # f32[N, 2] observed pixels
    valid: jax.Array,    # bool[N]
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    key: jax.Array,
    iters: int = 256,
    chi2_th: float = 5.991,
    min_inliers: int = 15,
) -> PnPResult:
    """All-hypotheses-at-once PnP RANSAC (reference: PnPsolver::iterate)."""
    N = X.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    vidx, = jnp.nonzero(valid, size=N, fill_value=0)
    pick = jax.random.randint(key, (iters, 6), 0, jnp.maximum(n_valid, 1))
    sel = vidx[pick]                                         # [iters, 6]
    xn = (uv - jnp.array([cx, cy])) / jnp.array([fx, fy])
    R_all, t_all = _dlt_pose(X[sel], xn[sel])                # [iters, ...]

    # score every hypothesis against every point
    Xc = jnp.einsum("hij,nj->hni", R_all, X) + t_all[:, None, :]
    z = Xc[..., 2]
    u = fx * Xc[..., 0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + cx
    v = fy * Xc[..., 1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + cy
    chi2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = valid[None, :] & (z > 1e-3) & (chi2 < chi2_th)
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    finite = jnp.all(jnp.isfinite(R_all), (-1, -2)) & jnp.all(
        jnp.isfinite(t_all), -1
    )
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    return PnPResult(
        success=counts[best] >= min_inliers,
        R=R_all[best],
        t=t_all[best],
        inliers=inl[best],
        n_inliers=counts[best],
    )
