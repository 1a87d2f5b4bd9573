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

CFG = EngineConfig(max_local_kfs=8, max_fixed_kfs=4, max_local_lms=128, max_obs_per_lm=8)


def make_problem(seed=0, n_cams=6, n_pts=100, noise_px=0.4, perturb=0.05):
    """Cameras on an arc looking at a point cloud; all observe all points."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(6, 10, n_pts)],
        -1,
    ).astype(np.float32)
    Rs, ts = [], []
    for i in range(n_cams):
        a = (i / (n_cams - 1) - 0.5) * 2.0
        eye = np.array([a * 2.0, 0.1 * a, 0.0])
        fwd = np.array([0.0, 0.0, 8.0]) - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, [0, -1, 0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd]).astype(np.float32)
        Rs.append(R)
        ts.append((-R @ eye).astype(np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)

    C = CFG.max_local_kfs + CFG.max_fixed_kfs
    P = CFG.max_local_lms
    O = CFG.max_obs_per_lm
    obs_cam = np.full((P, O), C, np.int32)
    obs_uv = np.zeros((P, O, 2), np.float32)
    obs_ok = np.zeros((P, O), bool)
    cam_pick = [rng.choice(n_cams, size=min(O, n_cams), replace=False) for _ in range(n_pts)]
    for p in range(n_pts):
        for o, c in enumerate(cam_pick[p]):
            Xc = Rs[c] @ pts[p] + ts[c]
            u = CFG.fx * Xc[0] / Xc[2] + CFG.cx
            v = CFG.fy * Xc[1] / Xc[2] + CFG.cy
            obs_cam[p, o] = c
            obs_uv[p, o] = [u + rng.normal(0, noise_px), v + rng.normal(0, noise_px)]
            obs_ok[p, o] = True

    # perturb poses (except the two gauge cams) and points
    R0 = np.zeros((C, 3, 3), np.float32)
    R0[:] = np.eye(3)
    t0 = np.zeros((C, 3), np.float32)
    R0[:n_cams] = Rs
    t0[:n_cams] = ts
    cam_opt = np.zeros((C,), bool)
    cam_opt[2:n_cams] = True
    for c in range(2, n_cams):
        xi = rng.normal(0, perturb, 6).astype(np.float32)
        Rp, tp = geo.se3_retract(jnp.asarray(R0[c]), jnp.asarray(t0[c]), jnp.asarray(xi))
        R0[c], t0[c] = np.asarray(Rp), np.asarray(tp)
    xyz0 = np.zeros((P, 3), np.float32)
    xyz0[:n_pts] = pts + rng.normal(0, perturb * 2, (n_pts, 3))

    prob = BAProblem(
        cam_slots=jnp.asarray(np.r_[np.arange(n_cams), np.full(C - n_cams, 999)], jnp.int32),
        cam_opt=jnp.asarray(cam_opt),
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        lm_ids=jnp.asarray(np.r_[np.arange(n_pts), np.full(P - n_pts, CFG.max_landmarks)], jnp.int32),
        xyz=jnp.asarray(xyz0),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.asarray(obs_ok.astype(np.float32)),
        obs_ok=jnp.asarray(obs_ok),
        obs_feat=jnp.zeros((P, O), jnp.int32),
    )
    return prob, Rs, ts, pts, n_cams, n_pts


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
