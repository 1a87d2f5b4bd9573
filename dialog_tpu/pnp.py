"""Batched EPnP RANSAC for relocalization.

Replaces the reference's EPnP solver (canonical ``src/PnPsolver.cc`` —
SURVEY.md §2.1). Instead of sequential adaptive RANSAC around the EPnP
control-point machinery, every hypothesis is solved and scored in one
device call (SURVEY.md §7.1 rule 3): the 12x12 eigensystems of all minimal
sets are one batched ``jnp.linalg.eigh``, and the inlier census is one
[iters, N] reprojection matrix.

The minimal solver is the reference's EPnP formulation (4 control points
from the PCA frame, barycentric coordinates, M^T M eigenvector, distance-
ratio beta for the N=1 case) followed by a Procrustes rigid fit from world
to camera-frame points — the batched equivalent of the reference's
``compute_R_and_t``. A 6-point DLT (the round-1..3 solver) is kept as the
``solver="dlt"`` alternative and as the A/B baseline in tests.
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


def _procrustes_rigid(Xw: jax.Array, Xc: jax.Array):
    """Batched rigid fit: R, t minimizing ||R Xw + t - Xc|| (no scale).

    Xw, Xc: [..., n, 3]. The reference's PnPsolver::estimate_R_and_t.
    """
    mu_w = jnp.mean(Xw, axis=-2)
    mu_c = jnp.mean(Xc, axis=-2)
    H = jnp.einsum("...ni,...nj->...ij", Xw - mu_w[..., None, :], Xc - mu_c[..., None, :])
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(jnp.einsum("...ji,...kj->...ik", Vt, U)))
    D = jnp.concatenate(
        [jnp.ones(d.shape + (2,)), d[..., None]], axis=-1
    )
    # R = V diag(1,1,d) U^T
    R = jnp.einsum("...ji,...j,...jk->...ik", Vt, D, jnp.swapaxes(U, -1, -2))
    t = mu_c - jnp.einsum("...ij,...j->...i", R, mu_w)
    return R, t


def _epnp_pose(X: jax.Array, xn: jax.Array) -> tuple[jax.Array, jax.Array]:
    """EPnP: X [..., n, 3] world points, xn [..., n, 2] normalized coords.

    Returns (R [..., 3, 3], t [..., 3]). Reference: PnPsolver::iterate's
    inner solve — choose_control_points, compute_barycentric_coordinates,
    fill_M, the M^T M eigendecomposition, and the N=1 beta case (the later
    pose_optimization refine plays the role of the reference's
    gauss_newton on the betas).
    """
    n = X.shape[-2]
    # --- control points: centroid + PCA frame -------------------------
    c0 = jnp.mean(X, axis=-2)                                 # [..., 3]
    Xc0 = X - c0[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", Xc0, Xc0) / n
    wv, Wv = jnp.linalg.eigh(cov)                             # ascending
    d = jnp.sqrt(jnp.maximum(wv, 1e-8))                       # [..., 3]
    # A columns are the scaled principal directions: A = Wv @ diag(d)
    A = Wv * d[..., None, :]                                  # [..., 3, 3]
    cw = jnp.concatenate(
        [c0[..., None, :], c0[..., None, :] + jnp.swapaxes(A, -1, -2)], axis=-2
    )                                                         # [..., 4, 3]
    # --- barycentric coordinates --------------------------------------
    a123 = jnp.einsum(
        "...ij,...nj->...ni", jnp.linalg.inv(A), Xc0
    )                                                         # [..., n, 3]
    alpha = jnp.concatenate(
        [1.0 - jnp.sum(a123, axis=-1, keepdims=True), a123], axis=-1
    )                                                         # [..., n, 4]
    # --- M matrix and its normal equations ----------------------------
    u = xn[..., 0]                                            # [..., n]
    v = xn[..., 1]
    zeros = jnp.zeros_like(alpha)
    # x-rows: per control j the 3 columns (a_j, 0, -a_j u)
    rx = jnp.stack([alpha, zeros, -alpha * u[..., None]], axis=-1)  # [...,n,4,3]
    ry = jnp.stack([zeros, alpha, -alpha * v[..., None]], axis=-1)
    M = jnp.concatenate(
        [
            rx.reshape(rx.shape[:-2] + (12,)),
            ry.reshape(ry.shape[:-2] + (12,)),
        ],
        axis=-2,
    )                                                         # [..., 2n, 12]
    MtM = jnp.einsum("...ni,...nj->...ij", M, M)
    _, V = jnp.linalg.eigh(MtM)
    vker = V[..., :, 0]                                       # smallest eig
    cc = vker.reshape(vker.shape[:-1] + (4, 3))               # [..., 4, 3]
    # --- beta (N=1 case): match inter-control distances ----------------
    ii, jj = jnp.triu_indices(4, k=1)
    dv = jnp.linalg.norm(cc[..., ii, :] - cc[..., jj, :], axis=-1)  # [..., 6]
    dw = jnp.linalg.norm(cw[..., ii, :] - cw[..., jj, :], axis=-1)
    beta = jnp.sum(dv * dw, axis=-1) / jnp.maximum(
        jnp.sum(dv * dv, axis=-1), 1e-12
    )
    Xcam = jnp.einsum("...nj,...jk->...nk", alpha, cc * beta[..., None, None])
    # cheirality: reconstructed camera-frame depths must be positive
    sgn = jnp.sign(jnp.sum(Xcam[..., 2], axis=-1))
    Xcam = Xcam * jnp.where(sgn == 0, 1.0, sgn)[..., None, None]
    return _procrustes_rigid(X, Xcam)


def _dlt_pose(X: jax.Array, xn: jax.Array) -> tuple[jax.Array, jax.Array]:
    """6-point DLT: X [..., 6, 3] world, xn [..., 6, 2] normalized coords.

    Returns (R [..., 3, 3], t [..., 3]) with R projected onto SO(3).
    """
    x, y = xn[..., 0], xn[..., 1]
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


@functools.partial(jax.jit, static_argnames=("iters", "solver"))
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
    solver: str = "epnp",
) -> PnPResult:
    """All-hypotheses-at-once PnP RANSAC (reference: PnPsolver::iterate)."""
    N = X.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    vidx, = jnp.nonzero(valid, size=N, fill_value=0)
    pick = jax.random.randint(key, (iters, 6), 0, jnp.maximum(n_valid, 1))
    sel = vidx[pick]                                         # [iters, 6]
    xn = (uv - jnp.array([cx, cy])) / jnp.array([fx, fy])
    minimal = _epnp_pose if solver == "epnp" else _dlt_pose
    R_all, t_all = minimal(X[sel], xn[sel])                  # [iters, ...]

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
