"""Shared Levenberg-Marquardt machinery (robust weights, damping loop).

Replaces g2o's ``optimization_algorithm_levenberg`` + robust Huber kernel
(canonical ``Thirdparty/g2o/g2o/core`` — SURVEY.md §2.2) with explicit
jit-friendly helpers used by the pose, BA, and pose-graph solvers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
        accept = new_cost < cost
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
