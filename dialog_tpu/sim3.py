"""Batched Sim3 estimation (Horn) with RANSAC.

Replaces the reference's Sim3 solver (canonical ``src/Sim3Solver.cc`` —
SURVEY.md §2.1): Horn's closed-form similarity from 3 correspondences inside
sequential RANSAC becomes one device call solving and scoring every
hypothesis at once (SURVEY.md §7.1 rule 3). ``fix_scale`` covers the
stereo/RGB-D mode where scale is known to be 1.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Sim3Result(NamedTuple):
    success: jax.Array   # bool
    s: jax.Array         # f32 scalar
    R: jax.Array         # f32[3, 3]
    t: jax.Array         # f32[3]
    inliers: jax.Array   # bool[N]
    n_inliers: jax.Array # i32


def _umeyama_batch(src, dst, with_scale):
    """Batched Umeyama over [..., M, 3] point sets -> (s, R, t)."""
    mu_s = jnp.mean(src, axis=-2, keepdims=True)
    mu_d = jnp.mean(dst, axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    cov = jnp.einsum("...mi,...mj->...ij", dc, sc) / src.shape[-2]
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    Dv = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )  # [..., 3]
    R = U @ (Dv[..., :, None] * Vt)
    var_s = jnp.mean(jnp.sum(sc * sc, axis=-1), axis=-1)
    s = jnp.where(
        with_scale,
        jnp.sum(S * Dv, axis=-1) / jnp.maximum(var_s, 1e-12),
        1.0,
    )
    t = mu_d[..., 0, :] - s[..., None] * jnp.einsum(
        "...ij,...j->...i", R, mu_s[..., 0, :]
    )
    return s, R, t


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def solve_sim3_ransac(
    X1: jax.Array,       # f32[N, 3] points in frame/world 1
    X2: jax.Array,       # f32[N, 3] corresponding points in frame/world 2
    valid: jax.Array,    # bool[N]
    key: jax.Array,
    iters: int = 128,
    fix_scale: bool = False,
    rel_th: float = 0.03,
    min_inliers: int = 20,
) -> Sim3Result:
    """Estimate S12: X2 ~ s R X1 + t, robust to outlier correspondences.

    Inlier test: residual under `rel_th` of the point's distance from the
    set centroid (scale-free analogue of the reference's per-octave
    reprojection gate).
    """
    N = X1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    vidx, = jnp.nonzero(valid, size=N, fill_value=0)
    pick = jax.random.randint(key, (iters, 3), 0, jnp.maximum(n_valid, 1))
    sel = vidx[pick]
    s_all, R_all, t_all = _umeyama_batch(X1[sel], X2[sel], not fix_scale)

    pred = (
        s_all[:, None, None] * jnp.einsum("hij,nj->hni", R_all, X1)
        + t_all[:, None, :]
    )
    err = jnp.linalg.norm(pred - X2[None], axis=-1)          # [iters, N]
    centroid = jnp.sum(
        jnp.where(valid[:, None], X2, 0.0), axis=0
    ) / jnp.maximum(n_valid, 1)
    depth = jnp.linalg.norm(X2 - centroid, axis=-1) + 1.0
    inl = valid[None, :] & (err < rel_th * depth[None, :])
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    finite = (
        jnp.all(jnp.isfinite(R_all), (-1, -2))
        & jnp.all(jnp.isfinite(t_all), -1)
        & jnp.isfinite(s_all)
        & (s_all > 1e-3)
        & (s_all < 1e3)
    )
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)

    # refine on the best hypothesis' inliers (weighted full Umeyama)
    w = inl[best].astype(jnp.float32)
    nw = jnp.maximum(jnp.sum(w), 3.0)
    mu1 = jnp.sum(X1 * w[:, None], 0) / nw
    mu2 = jnp.sum(X2 * w[:, None], 0) / nw
    sc = (X1 - mu1) * w[:, None]
    dc = (X2 - mu2) * w[:, None]
    cov = dc.T @ (X1 - mu1) / nw
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    Dv = jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * d
    R = U @ (Dv[:, None] * Vt)
    var1 = jnp.sum(jnp.sum((X1 - mu1) ** 2, -1) * w) / nw
    s = jnp.where(
        jnp.array(not fix_scale),
        jnp.sum(S * Dv) / jnp.maximum(var1, 1e-12),
        1.0,
    )
    t = mu2 - s * R @ mu1
    pred = s * X1 @ R.T + t
    err = jnp.linalg.norm(pred - X2, axis=-1)
    inliers = valid & (err < rel_th * depth)
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    return Sim3Result(
        success=n_inl >= min_inliers,
        s=s,
        R=R,
        t=t,
        inliers=inliers,
        n_inliers=n_inl,
    )
