"""Matrix-free Schur PCG solver tests.

solve_ba_pcg must agree with the dense blocked-Schur solver (which is itself
verified against a dense autodiff GN oracle in test_local_ba.py) — same
damping, same robust weights, only the camera solve differs.
"""

import numpy as np

from dialog_tpu.optim.local_ba import solve_ba
from dialog_tpu.optim.schur_pcg import solve_ba_pcg

from dialog_tpu.optim.synth_problem import FIXTURE_CFG as CFG, make_problem


class TestSchurPCG:
    def test_one_step_matches_dense(self):
        """One near-undamped LM step: PCG == dense Schur (CG is exact once
        iterations reach the reduced system's dimension)."""
        prob, Rs, ts, pts, n_cams, n_pts = make_problem(
            seed=3, n_cams=4, n_pts=20, noise_px=0.0, perturb=0.01
        )
        R_d, t_d, xyz_d, _ = solve_ba(prob, CFG, iters=1, lam0=1e-7)
        R_p, t_p, xyz_p, _ = solve_ba_pcg(
            prob, CFG, iters=1, lam0=1e-7, cg_iters=24, cg_tol=0.0
        )
        np.testing.assert_allclose(np.asarray(R_p), np.asarray(R_d), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_d), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(xyz_p)[:n_pts], np.asarray(xyz_d)[:n_pts], atol=1e-4
        )

    def test_cg_early_exit_cuts_allreduce_count(self):
        """Each CG iteration costs one cross-shard all-reduce on a sharded
        problem; the relative-residual early exit must at least halve the
        fixed 48-iteration budget (VERDICT r4 directive 5)."""
        prob, *_ = make_problem()
        *_, n_cg = solve_ba_pcg(
            prob, CFG, iters=10, cg_iters=48, return_cg_iters=True
        )
        assert int(n_cg) < 10 * 48 // 2, int(n_cg)
        assert int(n_cg) > 0

    def test_recovers_ground_truth(self):
        prob, Rs, ts, pts, n_cams, n_pts = make_problem()
        R, t, xyz, cost = solve_ba_pcg(prob, CFG, iters=15, cg_iters=48)
        R, t, xyz = np.asarray(R), np.asarray(t), np.asarray(xyz)
        for c in range(2, n_cams):
            dR = R[c] @ Rs[c].T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 0.15, (c, ang)
            assert np.linalg.norm(t[c] - ts[c]) < 0.02, c
        err = np.linalg.norm(xyz[:n_pts] - pts, axis=1)
        assert np.median(err) < 0.02

    def test_fixed_cameras_unchanged(self):
        prob, Rs, ts, *_ = make_problem()
        R, t, _, _ = solve_ba_pcg(prob, CFG, iters=5)
        np.testing.assert_allclose(np.asarray(R)[0], Rs[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(t)[1], ts[1], atol=1e-6)
