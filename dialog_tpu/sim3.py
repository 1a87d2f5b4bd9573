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
def refine_sim3_reproj(
    s0, R0, t0,
    X1, X2,              # f32[N, 3] camera-frame points at the two ends
    uv1, uv2,            # f32[N, 2] observed pixels of those points
    valid,
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 10,
    fix_scale: bool = False,
    chi2_th: float = 9.21,
):
    """Image-space Sim3 refinement with bidirectional reprojection edges.

    Reference: ``Optimizer::OptimizeSim3`` (g2o VertexSim3Expmap with
    EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ, Huber). Residuals:
    pi(S21 X1) - uv2 and pi(S21^-1 X2) - uv1; the 7-dof damped GN uses an
    autodiff Jacobian of the stacked residual (one tall [4N, 7] system —
    tiny).
    """
    from . import geometry as geo
    from .optim.lm import huber_weight

    def residuals(xi, s, R, t):
        s2, R2, t2 = geo.sim3_retract(s, R, t, xi)
        Xf = geo.sim3_apply(jnp.broadcast_to(s2, X1.shape[:1]), R2, t2, X1)
        si, Ri, ti = geo.sim3_inv(s2, R2, t2)
        Xb = geo.sim3_apply(jnp.broadcast_to(si, X2.shape[:1]), Ri, ti, X2)
        zf = jnp.where(jnp.abs(Xf[:, 2]) < 1e-6, 1e-6, Xf[:, 2])
        zb = jnp.where(jnp.abs(Xb[:, 2]) < 1e-6, 1e-6, Xb[:, 2])
        rf = jnp.stack(
            [fx * Xf[:, 0] / zf + cx - uv2[:, 0], fy * Xf[:, 1] / zf + cy - uv2[:, 1]],
            -1,
        )
        rb = jnp.stack(
            [fx * Xb[:, 0] / zb + cx - uv1[:, 0], fy * Xb[:, 1] / zb + cy - uv1[:, 1]],
            -1,
        )
        ok = valid & (Xf[:, 2] > 1e-3) & (Xb[:, 2] > 1e-3)
        return rf, rb, ok

    zero7 = jnp.zeros(7)
    mask7 = jnp.ones(7).at[6].set(0.0 if fix_scale else 1.0)

    def step(carry, _):
        s, R, t, lam = carry
        rf, rb, ok = residuals(zero7, s, R, t)
        Jf = jax.jacfwd(lambda x: residuals(x, s, R, t)[0])(zero7)  # [N,2,7]
        Jb = jax.jacfwd(lambda x: residuals(x, s, R, t)[1])(zero7)
        wf = huber_weight(jnp.sum(rf * rf, -1), chi2_th) * ok
        wb = huber_weight(jnp.sum(rb * rb, -1), chi2_th) * ok
        H = (
            jnp.einsum("nki,n,nkj->ij", Jf, wf, Jf)
            + jnp.einsum("nki,n,nkj->ij", Jb, wb, Jb)
        )
        g = jnp.einsum("nki,n,nk->i", Jf, wf, rf) + jnp.einsum(
            "nki,n,nk->i", Jb, wb, rb
        )
        H = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-9)) + 1e-9 * jnp.eye(7)
        dx = -jnp.linalg.solve(H, g) * mask7
        s2, R2, t2 = geo.sim3_retract(s, R, t, dx)
        R2 = geo.orthogonalize(R2)
        # accept if robust cost decreased
        def cost(sa, Ra, ta):
            rf2, rb2, ok2 = residuals(zero7, sa, Ra, ta)
            return jnp.sum(
                ok2 * (jnp.minimum(jnp.sum(rf2 * rf2, -1), chi2_th)
                       + jnp.minimum(jnp.sum(rb2 * rb2, -1), chi2_th))
            )
        better = cost(s2, R2, t2) < cost(s, R, t)
        s = jnp.where(better, s2, s)
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (s, R, t, lam), None

    (s, R, t, _), _ = jax.lax.scan(
        step, (s0, R0, t0, jnp.float32(1e-4)), jnp.arange(iters)
    )
    # final inlier classification
    rf, rb, ok = residuals(zero7, s, R, t)
    chif = jnp.sum(rf * rf, -1)
    chib = jnp.sum(rb * rb, -1)
    inl = ok & (chif < chi2_th) & (chib < chi2_th)
    return s, R, t, inl, jnp.sum(inl.astype(jnp.int32))


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
