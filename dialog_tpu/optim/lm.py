"""Shared Levenberg-Marquardt machinery (robust weights, damping loop).

Replaces g2o's ``optimization_algorithm_levenberg`` + robust Huber kernel
(canonical ``Thirdparty/g2o/g2o/core`` — SURVEY.md §2.2) with explicit
jit-friendly helpers used by the pose, BA, and pose-graph solvers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of batched 3x3 matrices.

    `jnp.linalg.inv` lowers to batched LU, which is slow for huge batches of
    tiny matrices on TPU; the adjugate is pure elementwise VPU work.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def chol3x3(A: jax.Array) -> jax.Array:
    """Closed-form lower-Cholesky of batched SPD 3x3 matrices (VPU-only)."""
    a11 = jnp.sqrt(jnp.maximum(A[..., 0, 0], 1e-18))
    l21 = A[..., 1, 0] / a11
    l31 = A[..., 2, 0] / a11
    l22 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l21 * l21, 1e-18))
    l32 = (A[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l31 * l31 - l32 * l32, 1e-18))
    z = jnp.zeros_like(a11)
    return jnp.stack(
        [
            jnp.stack([a11, z, z], -1),
            jnp.stack([l21, l22, z], -1),
            jnp.stack([l31, l32, l33], -1),
        ],
        -2,
    )


def tri_inv3x3_lower(L: jax.Array) -> jax.Array:
    """Closed-form inverse of batched lower-triangular 3x3 matrices.

    With ``L = chol3x3(A)`` this gives ``A^-1 = L^-T L^-1`` as a product of
    bounded factors — numerically far safer than the adjugate inverse for
    near-singular SPD blocks (the adjugate's clamped determinant produces a
    non-PD "inverse" whose Cholesky explodes; see solve_ba's Schur split).
    """
    l11, l22, l33 = L[..., 0, 0], L[..., 1, 1], L[..., 2, 2]
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -L[..., 1, 0] * i11 * i22
    i31 = (L[..., 1, 0] * L[..., 2, 1] - L[..., 1, 1] * L[..., 2, 0]) * (
        i11 * i22 * i33
    )
    i32 = -L[..., 2, 1] * i22 * i33
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([i11, z, z], -1),
            jnp.stack([i21, i22, z], -1),
            jnp.stack([i31, i32, i33], -1),
        ],
        -2,
    )


def all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.bool_(True)
    for x in leaves:
        if jnp.issubdtype(x.dtype, jnp.floating):
            ok = ok & jnp.all(jnp.isfinite(x))
    return ok


def huber_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    """IRLS weight for the Huber loss given squared error chi2 = r^T W r.

    w = 1 for chi2 <= delta^2, else delta/sqrt(chi2) — multiplying the
    residual/Jacobian rows by sqrt(w) reproduces g2o's robustified system.
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def solve_damped(H: jax.Array, g: jax.Array, lam: jax.Array) -> jax.Array:
    """Solve (H + lam * diag(H)) dx = -g (LM with multiplicative damping)."""
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    Hd = H + lam * jnp.eye(H.shape[-1], dtype=H.dtype) * jnp.maximum(d, 1e-9)
    return -jnp.linalg.solve(Hd, g[..., None])[..., 0]


def lm_loop(cost_and_system, retract, x0, iters: int, lam0: float = 1e-3):
    """Generic damped-LM driver as a `fori_loop`.

    cost_and_system(x) -> (cost, H, g); retract(x, dx) -> x'.
    Accept/reject with multiplicative damping (down 0.5 on accept, up 4 on
    reject), matching g2o's Nielsen-style strategy closely enough for SLAM.
    """

    def body(_, carry):
        # carry the system evaluated at the current accepted point, so each
        # iteration costs ONE evaluation (the trial point's system doubles as
        # the next iteration's, when accepted)
        x, lam, cost, H, g = carry
        dx = solve_damped(H, g, lam)
        x_new = retract(x, dx)
        new_cost, H_new, g_new = cost_and_system(x_new)
        # a non-finite step can LOWER the masked robust cost (NaN residuals
        # drop out of the valid mask) — never accept one
        accept = (new_cost < cost) & all_finite(x_new)
        x = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), x_new, x
        )
        H = jnp.where(accept, H_new, H)
        g = jnp.where(accept, g_new, g)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return x, lam, cost, H, g

    cost0, H0, g0 = cost_and_system(x0)
    x, _, cost, _, _ = jax.lax.fori_loop(
        0, iters, body, (x0, jnp.float32(lam0), cost0, H0, g0)
    )
    return x, cost
