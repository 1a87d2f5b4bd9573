"""Batched EPnP RANSAC tests + the DLT A/B demanded by VERDICT r3 item 7.

The reference relocalizes with EPnP inside RANSAC (src/PnPsolver.cc); the
engine's solver must match or beat the round-1..3 DLT-6 hypothesis
generator at equal iteration counts on noisy, outlier-ridden problems.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dialog_tpu.pnp import solve_pnp_ransac

FX = FY = 500.0
CX, CY = 320.0, 240.0


def make_case(seed, n=120, noise_px=1.0, outlier_frac=0.3):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 12, n)],
        -1,
    ).astype(np.float32)
    # random ground-truth pose
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0.05, 0.4)
    K_ = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = (np.eye(3) + np.sin(ang) * K_ + (1 - np.cos(ang)) * K_ @ K_).astype(
        np.float32
    )
    t = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    Xc = X @ R.T + t
    z = Xc[:, 2]
    keep = z > 0.5
    u = FX * Xc[:, 0] / z + CX + rng.normal(0, noise_px, n)
    v = FY * Xc[:, 1] / z + CY + rng.normal(0, noise_px, n)
    # outliers: random pixels
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    u[out_idx] = rng.uniform(0, 2 * CX, n_out)
    v[out_idx] = rng.uniform(0, 2 * CY, n_out)
    uv = np.stack([u, v], -1).astype(np.float32)
    return X, uv, keep, R, t


def run_solver(solver, n_trials=30, iters=128):
    ok, rot_err, t_err = 0, [], []
    for s in range(n_trials):
        X, uv, valid, R_gt, t_gt = make_case(s)
        res = solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
            FX, FY, CX, CY, jax.random.PRNGKey(s),
            iters=iters, solver=solver,
        )
        if bool(res.success):
            R = np.asarray(res.R)
            dR = R @ R_gt.T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            if ang < 5.0:            # a hypothesis the pose refine can finish
                ok += 1
                rot_err.append(ang)
                t_err.append(np.linalg.norm(np.asarray(res.t) - t_gt))
    return ok, (np.median(rot_err) if rot_err else np.inf), (
        np.median(t_err) if t_err else np.inf
    )


class TestEPnP:
    def test_clean_recovery(self):
        X, uv, valid, R_gt, t_gt = make_case(seed=1, noise_px=0.0, outlier_frac=0.0)
        res = solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
            FX, FY, CX, CY, jax.random.PRNGKey(0), iters=64,
        )
        assert bool(res.success)
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5, ang
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05

    def test_epnp_not_worse_than_dlt(self):
        """Equal-iteration A/B on noisy 30%-outlier cases (VERDICT item 7)."""
        ok_e, rot_e, te_e = run_solver("epnp")
        ok_d, rot_d, te_d = run_solver("dlt")
        # success-rate parity or better, and no accuracy regression
        assert ok_e >= ok_d, (ok_e, ok_d)
        assert rot_e <= rot_d * 1.5 + 0.1, (rot_e, rot_d)
        assert te_e <= te_d * 1.5 + 0.01, (te_e, te_d)
