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


class TestDuplicateBindings:
    """Landmark fusion's global replace can bind two features of one
    keyframe row to the same landmark (ADVICE r4); the problem builders must
    keep exactly one observation per (keyframe, landmark) with no holes."""

    def _map_with_dup(self):
        from dialog_tpu.containers import empty_map

        cfg = EngineConfig(
            max_features=8, max_keyframes=8, max_landmarks=16,
            max_local_kfs=4, max_fixed_kfs=2, max_obs_per_lm=4,
        )
        m = empty_map(cfg)
        kfs = m.kfs._replace(
            valid=m.kfs.valid.at[:3].set(True),
            seq=m.kfs.seq.at[:3].set(jnp.asarray([0, 1, 2])),
            feat_valid=m.kfs.feat_valid.at[:3].set(True),
            # KF0 binds features 0 AND 2 to landmark 5 (the duplicate), and
            # feature 1 to landmark 6; KF1/KF2 bind one feature each to both
            obs_lm=(
                m.kfs.obs_lm
                .at[0, 0].set(5).at[0, 2].set(5).at[0, 1].set(6)
                .at[1, 0].set(5).at[1, 1].set(6)
                .at[2, 0].set(5).at[2, 1].set(6)
            ),
            uv=m.kfs.uv.at[:3].set(
                jnp.asarray(np.random.default_rng(0).uniform(
                    100, 400, (3, 8, 2)).astype(np.float32))
            ),
        )
        lms = m.lms._replace(
            valid=m.lms.valid.at[jnp.asarray([5, 6])].set(True),
            xyz=m.lms.xyz.at[jnp.asarray([5, 6])].set(
                jnp.asarray([[0.0, 0.0, 5.0], [1.0, 0.0, 6.0]])
            ),
        )
        covis = m.covis.at[:3, :3].set(20).at[
            jnp.arange(3), jnp.arange(3)].set(0)
        return cfg, m._replace(kfs=kfs, lms=lms, covis=covis)

    def test_local_builder_dedupes_without_holes(self):
        from dialog_tpu.optim.local_ba import build_problem

        cfg, m = self._map_with_dup()
        prob = build_problem(m, jnp.int32(0), cfg)
        P = cfg.max_local_lms if hasattr(cfg, "max_local_lms") else 0
        lm_ids = np.asarray(prob.lm_ids)
        obs_cam = np.asarray(prob.obs_cam)
        obs_ok = np.asarray(prob.obs_ok)
        cam_slots = np.asarray(prob.cam_slots)
        for lm in (5, 6):
            p = int(np.nonzero(lm_ids == lm)[0][0])
            cams = [int(cam_slots[c]) for c, ok in zip(obs_cam[p], obs_ok[p]) if ok]
            assert sorted(cams) == [0, 1, 2], (lm, cams)   # one obs per KF
            # no holes: valid observations are packed at the front
            ok_row = obs_ok[p]
            assert not np.any(~ok_row[:3])

    def test_global_builder_dedupes_without_holes(self):
        from dialog_tpu.optim.global_ba import build_global_problem

        cfg, m = self._map_with_dup()
        prob, n_dropped = build_global_problem(m, cfg)
        assert int(n_dropped) == 0   # duplicates are not "truncation"
        obs_cam = np.asarray(prob.obs_cam)
        obs_ok = np.asarray(prob.obs_ok)
        for lm in (5, 6):
            cams = [int(c) for c, ok in zip(obs_cam[lm], obs_ok[lm]) if ok]
            assert sorted(cams) == [0, 1, 2], (lm, cams)
            assert not np.any(~obs_ok[lm][:3])
