"""Sim3 RANSAC + pose-graph optimization against ground truth (§7.6)."""

import numpy as np
import jax
import jax.numpy as jnp

from dialog_tpu import geometry as geo
from dialog_tpu.sim3 import solve_sim3_ransac
from dialog_tpu.optim.pose_graph import PoseGraphProblem, solve_pose_graph


class TestSim3:
    def _make(self, seed=0, n=100, outlier_frac=0.2, s_gt=1.4):
        rng = np.random.default_rng(seed)
        X1 = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        phi = np.array([0.2, -0.3, 0.5], np.float32)
        R_gt = np.asarray(geo.so3_exp(jnp.asarray(phi)))
        t_gt = np.array([0.5, -1.0, 2.0], np.float32)
        X2 = (s_gt * X1 @ R_gt.T + t_gt + rng.normal(0, 0.005, (n, 3))).astype(
            np.float32
        )
        n_out = int(n * outlier_frac)
        X2[:n_out] += rng.uniform(1.0, 3.0, (n_out, 3))
        return X1, X2, s_gt, R_gt, t_gt

    def test_recovers_similarity(self):
        X1, X2, s_gt, R_gt, t_gt = self._make()
        res = solve_sim3_ransac(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(len(X1), bool),
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert abs(float(res.s) - s_gt) < 0.02
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05
        assert int(res.n_inliers) >= 70

    def test_fixed_scale_mode(self):
        X1, X2, _, R_gt, t_gt = self._make(seed=1, s_gt=1.0, outlier_frac=0.1)
        res = solve_sim3_ransac(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(len(X1), bool),
            jax.random.PRNGKey(1), fix_scale=True,
        )
        assert bool(res.success)
        assert float(res.s) == 1.0

    def test_too_few_inliers_fails(self):
        rng = np.random.default_rng(2)
        X1 = rng.uniform(-3, 3, (60, 3)).astype(np.float32)
        X2 = rng.uniform(-3, 3, (60, 3)).astype(np.float32)  # unrelated
        res = solve_sim3_ransac(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(60, bool),
            jax.random.PRNGKey(2),
        )
        assert not bool(res.success)


class TestPoseGraph:
    def test_loop_closure_distributes_drift(self):
        """Chain of K nodes with odometry drift + one loop edge -> near-gt."""
        K = 12
        rng = np.random.default_rng(3)
        # ground-truth poses on a circle (world->camera)
        gt = []
        for k in range(K):
            th = 2 * np.pi * k / K
            R = np.asarray(
                geo.so3_exp(jnp.asarray([0.0, th, 0.0], jnp.float32))
            )
            t = np.array([np.sin(th), 0.0, 3.0 - np.cos(th)], np.float32)
            gt.append((R, t))

        # drifted initial states: accumulate noisy odometry from node 0
        s0 = np.ones(K, np.float32)
        R0 = np.zeros((K, 3, 3), np.float32)
        t0 = np.zeros((K, 3), np.float32)
        R0[0], t0[0] = gt[0]
        for k in range(1, K):
            # true relative with small noise
            R_rel = gt[k][0] @ gt[k - 1][0].T
            t_rel = gt[k][1] - R_rel @ gt[k - 1][1]
            xi = rng.normal(0, 0.02, 6).astype(np.float32)
            dR, dt = geo.se3_exp(jnp.asarray(xi))
            R_rel = np.asarray(dR) @ R_rel
            t_rel = np.asarray(dR) @ t_rel + np.asarray(dt)
            R0[k] = R_rel @ R0[k - 1]
            t0[k] = R_rel @ t0[k - 1] + t_rel

        # edges: consecutive chain with TRUE relative measurements + loop
        e_i = np.arange(1, K, dtype=np.int32)
        e_j = np.arange(0, K - 1, dtype=np.int32)
        m_R = np.stack([gt[i][0] @ gt[j][0].T for i, j in zip(e_i, e_j)])
        m_t = np.stack(
            [gt[i][1] - (gt[i][0] @ gt[j][0].T) @ gt[j][1] for i, j in zip(e_i, e_j)]
        )
        # loop edge K-1 -> 0
        e_i = np.r_[e_i, np.int32(K - 1)]
        e_j = np.r_[e_j, np.int32(0)]
        m_R = np.concatenate([m_R, (gt[K - 1][0] @ gt[0][0].T)[None]])
        m_t = np.concatenate(
            [m_t, (gt[K - 1][1] - (gt[K - 1][0] @ gt[0][0].T) @ gt[0][1])[None]]
        )
        E = len(e_i)
        prob = PoseGraphProblem(
            s=jnp.asarray(s0),
            R=jnp.asarray(R0),
            t=jnp.asarray(t0),
            opt=jnp.asarray(np.r_[False, np.ones(K - 1, bool)]),
            e_i=jnp.asarray(e_i),
            e_j=jnp.asarray(e_j),
            m_s=jnp.ones(E),
            m_R=jnp.asarray(m_R),
            m_t=jnp.asarray(m_t),
            e_ok=jnp.ones(E, bool),
            e_w=jnp.asarray(np.r_[np.ones(E - 1), 5.0], jnp.float32),
        )
        # drift before optimization
        pre = max(
            np.linalg.norm(t0[k] - gt[k][1]) for k in range(K)
        )
        s, R, t, cost = solve_pose_graph(prob, iters=25)
        s, R, t = np.asarray(s), np.asarray(R), np.asarray(t)
        post = max(
            np.linalg.norm(t[k] / s[k] - gt[k][1]) for k in range(K)
        )
        assert pre > 0.05            # the test is non-trivial
        assert post < 0.02, (pre, post)
        assert np.allclose(s, 1.0, atol=0.02)  # no spurious scale

    def test_scale_drift_correction(self):
        """Monocular-style scale drift absorbed by the Sim3 nodes."""
        K = 8
        # straight line, each step translation [1,0,0], but states have
        # scale-drifted translations (shrinking steps)
        gt_t = np.stack([np.array([k, 0, 0], np.float32) for k in range(K)])
        eye = np.eye(3, dtype=np.float32)
        drift = 0.9
        t0 = np.zeros((K, 3), np.float32)
        for k in range(1, K):
            t0[k] = t0[k - 1] + np.array([drift**k, 0, 0], np.float32)
        prob = PoseGraphProblem(
            s=jnp.ones(K),
            R=jnp.asarray(np.tile(eye, (K, 1, 1))),
            t=jnp.asarray(-t0),  # world->camera: t = -R c = -c
            opt=jnp.asarray(np.r_[False, np.ones(K - 1, bool)]),
            e_i=jnp.asarray(np.arange(1, K, dtype=np.int32)),
            e_j=jnp.asarray(np.arange(0, K - 1, dtype=np.int32)),
            m_s=jnp.ones(K - 1),
            m_R=jnp.asarray(np.tile(eye, (K - 1, 1, 1))),
            # true relative: camera moves +1 in x each step -> t_rel = -1
            m_t=jnp.asarray(np.tile(np.array([-1.0, 0, 0], np.float32), (K - 1, 1))),
            e_ok=jnp.ones(K - 1, bool),
            e_w=jnp.ones(K - 1),
        )
        s, R, t, cost = solve_pose_graph(prob, iters=25)
        centers = -np.einsum("kij,kj->ki", np.transpose(np.asarray(R), (0, 2, 1)),
                             np.asarray(t) / np.asarray(s)[:, None])
        err = np.abs(centers[:, 0] - gt_t[:, 0]).max()
        assert err < 0.05, err


class TestSim3Refine:
    def test_reproj_refinement_tightens_ransac_estimate(self):
        from dialog_tpu.sim3 import refine_sim3_reproj
        rng = np.random.default_rng(7)
        n = 120
        # camera-frame points at end 1
        X1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       rng.uniform(4, 9, n)], -1).astype(np.float32)
        s_gt = 1.25
        phi = np.array([0.1, -0.2, 0.15], np.float32)
        R_gt = np.asarray(geo.so3_exp(jnp.asarray(phi)))
        t_gt = np.array([0.4, -0.2, 0.6], np.float32)
        X2 = (s_gt * X1 @ R_gt.T + t_gt).astype(np.float32)
        fx = fy = 500.0; cx = 320.0; cy = 240.0
        uv1 = np.stack([fx*X1[:,0]/X1[:,2]+cx, fy*X1[:,1]/X1[:,2]+cy], -1)
        uv2 = np.stack([fx*X2[:,0]/X2[:,2]+cx, fy*X2[:,1]/X2[:,2]+cy], -1)
        uv1 += rng.normal(0, 0.3, uv1.shape)
        uv2 += rng.normal(0, 0.3, uv2.shape)
        # start from a perturbed similarity
        xi = np.r_[rng.normal(0, 0.05, 6), 0.05].astype(np.float32)
        s0, R0, t0 = geo.sim3_retract(
            jnp.asarray(s_gt, jnp.float32), jnp.asarray(R_gt), jnp.asarray(t_gt),
            jnp.asarray(xi))
        s, R, t, inl, n_inl = refine_sim3_reproj(
            s0, R0, t0, jnp.asarray(X1), jnp.asarray(X2),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(n, bool), fx, fy, cx, cy, iters=12)
        assert abs(float(s) - s_gt) < 0.01
        dR = np.asarray(R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR)-1)/2, -1, 1)))
        assert ang < 0.3, ang
        assert np.linalg.norm(np.asarray(t) - t_gt) < 0.03
        assert int(n_inl) > 100
