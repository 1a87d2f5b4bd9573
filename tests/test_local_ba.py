"""Schur-complement BA solver tests (SURVEY.md §7.4 item 2).

Verifies the blocked Schur LM against ground truth on synthetic problems and
against a dense autodiff Gauss-Newton oracle on a tiny problem.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dialog_tpu import geometry as geo
from dialog_tpu.config import EngineConfig
from dialog_tpu.optim.local_ba import BAProblem, solve_ba
from dialog_tpu.optim.synth_problem import FIXTURE_CFG as CFG, make_problem


class TestSchurBA:
    def test_recovers_ground_truth(self):
        prob, Rs, ts, pts, n_cams, n_pts = make_problem()
        R, t, xyz, cost = solve_ba(prob, CFG, iters=15)
        R, t, xyz = np.asarray(R), np.asarray(t), np.asarray(xyz)
        for c in range(2, n_cams):
            dR = R[c] @ Rs[c].T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 0.15, (c, ang)  # noise floor at 0.4px obs noise
            assert np.linalg.norm(t[c] - ts[c]) < 0.02, c
        err = np.linalg.norm(xyz[:n_pts] - pts, axis=1)
        assert np.median(err) < 0.02

    def test_cost_decreases_to_noise_floor(self):
        prob, *_ , n_pts = make_problem(noise_px=0.5)
        n_obs = int(np.asarray(prob.obs_ok).sum())
        _, _, _, cost = solve_ba(prob, CFG, iters=15)
        # robust cost ~ sum of chi2 ~ n_obs * 2 * noise^2 (sigma=1 weights)
        assert float(cost) < 3.0 * n_obs * 2 * 0.5**2

    def test_fixed_cameras_unchanged(self):
        prob, Rs, ts, *_ = make_problem()
        R, t, _, _ = solve_ba(prob, CFG, iters=5)
        np.testing.assert_allclose(np.asarray(R)[0], Rs[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(t)[1], ts[1], atol=1e-6)

    def test_matches_dense_autodiff_gn(self):
        """One undamped GN step of the Schur solver == dense normal equations."""
        prob, Rs, ts, pts, n_cams, n_pts = make_problem(
            seed=3, n_cams=4, n_pts=20, noise_px=0.0, perturb=0.01
        )

        # dense reference: parameters = (xi per opt cam, xyz per point)
        opt_cams = [c for c in range(n_cams) if bool(prob.cam_opt[c])]

        def residual_vec(params):
            xis = params[: len(opt_cams) * 6].reshape(-1, 6)
            dxyz = params[len(opt_cams) * 6 :].reshape(-1, 3)
            rs = []
            obs_cam = np.asarray(prob.obs_cam)
            obs_ok = np.asarray(prob.obs_ok)
            for p in range(n_pts):
                for o in range(obs_cam.shape[1]):
                    if not obs_ok[p, o]:
                        continue
                    c = int(obs_cam[p, o])
                    if c in opt_cams:
                        xi = xis[opt_cams.index(c)]
                        Rc, tc = geo.se3_retract(prob.R[c], prob.t[c], xi)
                    else:
                        Rc, tc = prob.R[c], prob.t[c]
                    X = prob.xyz[p] + dxyz[p]
                    uv, _ = geo.project(Rc, tc, X, CFG.fx, CFG.fy, CFG.cx, CFG.cy)
                    rs.append(uv - prob.obs_uv[p, o])
            return jnp.concatenate(rs)

        params0 = jnp.zeros(len(opt_cams) * 6 + n_pts * 3)
        J = jax.jacfwd(residual_vec)(params0)
        r = residual_vec(params0)
        H = J.T @ J
        g = J.T @ r
        lam = 1e-7
        H = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-9)) + 1e-9 * jnp.eye(H.shape[0])
        d_dense = -jnp.linalg.solve(H, g)

        # one step of the Schur solver with (almost) no damping
        R1, t1, xyz1, _ = solve_ba(prob, CFG, iters=1, lam0=1e-7)
        # compare camera update of the first optimized cam
        c = opt_cams[0]
        dxi_dense = d_dense[:6]
        R_dense, t_dense = geo.se3_retract(prob.R[c], prob.t[c], dxi_dense)
        # atol 1e-3: f32 normal equations, two different solve orderings
        np.testing.assert_allclose(np.asarray(R1)[c], np.asarray(R_dense), atol=1e-3)
        np.testing.assert_allclose(np.asarray(t1)[c], np.asarray(t_dense), atol=1e-3)
        # and a landmark update
        d_pt = d_dense[len(opt_cams) * 6 : len(opt_cams) * 6 + 3]
        np.testing.assert_allclose(
            np.asarray(xyz1)[0], np.asarray(prob.xyz[0] + d_pt), atol=1e-3
        )
