"""Two-view init + motion-only BA against synthetic ground truth (§7.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dialog_tpu import geometry as geo
from dialog_tpu import matching
from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.init2view import initialize_two_view
from dialog_tpu.optim import pose_optimization

CFG = EngineConfig(max_features=512)


def _matched_pairs(scene, i, j, **kw):
    fa, ida = synth.observe(scene, i, **kw)
    fb, idb = synth.observe(scene, j, **kw)
    d = matching.hamming_distance_matrix(fa.desc, fb.desc)
    mb, _ = matching.match_mutual(d, fa.valid, fb.valid, max_dist=60, ratio=0.9)
    mb = np.asarray(mb)
    ok = mb >= 0
    uv1 = np.asarray(fa.uv)
    uv2 = np.asarray(fb.uv)[np.clip(mb, 0, None)]
    # oracle correctness of the matches themselves
    match_correct = (ida == idb[np.clip(mb, 0, None)]) & ok
    return (
        jnp.asarray(uv1),
        jnp.asarray(uv2),
        jnp.asarray(ok),
        match_correct,
        fa,
        ida,
    )


class TestTwoViewInit:
    def test_recovers_known_motion(self):
        scene = synth.make_scene(seed=1, n_points=400, n_frames=10, cfg=CFG)
        uv1, uv2, ok, correct, _, _ = _matched_pairs(scene, 0, 6, noise_px=0.4)
        assert correct.sum() > 150  # matching sanity
        res = initialize_two_view(
            uv1, uv2, ok, CFG.fx, CFG.fy, CFG.cx, CFG.cy, jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        R_gt, t_gt = synth.gt_relative_pose(scene, 0, 6)
        # rotation error
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5
        # translation direction error (scale is free)
        t_est = np.asarray(res.t)
        cos = abs(t_est @ t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        assert cos > 0.999
        assert int(res.n_good) > 100

    def test_triangulated_points_match_gt_up_to_scale(self):
        scene = synth.make_scene(seed=2, n_points=400, n_frames=10, cfg=CFG)
        uv1, uv2, ok, _, fa, ida = _matched_pairs(scene, 0, 6, noise_px=0.3)
        res = initialize_two_view(
            uv1, uv2, ok, CFG.fx, CFG.fy, CFG.cx, CFG.cy, jax.random.PRNGKey(1)
        )
        good = np.asarray(res.good)
        pts = np.asarray(res.points)[good]
        # ground truth points in cam-0 frame
        R0, t0 = scene.R[0], scene.t[0]
        gt = (scene.xyz[ida[good]] @ R0.T + t0).astype(np.float32)
        scale = np.median(gt[:, 2]) / np.median(pts[:, 2])
        err = np.linalg.norm(pts * scale - gt, axis=1)
        assert np.median(err) < 0.05 * np.median(gt[:, 2])

    def test_insufficient_matches_fails_gracefully(self):
        uv = jnp.zeros((64, 2))
        ok = jnp.zeros((64,), bool).at[:5].set(True)
        res = initialize_two_view(
            uv, uv, ok, CFG.fx, CFG.fy, CFG.cx, CFG.cy, jax.random.PRNGKey(0)
        )
        assert not bool(res.success)


class TestPoseOptimization:
    def _setup(self, seed=0, n=300, noise=0.5, outlier_frac=0.0):
        scene = synth.make_scene(seed=seed, n_points=n, n_frames=5, cfg=CFG)
        fr, ids = synth.observe(scene, 2, noise_px=noise)
        valid = np.asarray(fr.valid)
        X = np.zeros((CFG.max_features, 3), np.float32)
        X[valid] = scene.xyz[ids[valid]]
        uv = np.asarray(fr.uv).copy()
        if outlier_frac > 0:
            rng = np.random.default_rng(5)
            n_out = int(valid.sum() * outlier_frac)
            out_idx = rng.choice(np.nonzero(valid)[0], n_out, replace=False)
            uv[out_idx] += rng.uniform(30, 120, (n_out, 2))
        return scene, X, uv, valid

    def test_converges_from_perturbed_pose(self):
        scene, X, uv, valid = self._setup(noise=0.5)
        R_gt, t_gt = scene.R[2], scene.t[2]
        # perturb by ~3 deg + 0.2m
        xi = jnp.asarray([0.1, -0.15, 0.1, 0.03, -0.04, 0.02], jnp.float32)
        R0, t0 = geo.se3_retract(jnp.asarray(R_gt), jnp.asarray(t_gt), xi)
        res = pose_optimization(
            R0, t0, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(CFG.max_features), jnp.asarray(valid),
            CFG.fx, CFG.fy, CFG.cx, CFG.cy,
        )
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        terr = np.linalg.norm(np.asarray(res.t) - t_gt)
        assert ang < 0.1, ang
        assert terr < 0.02, terr
        assert int(res.n_inliers) > 0.9 * valid.sum()

    def test_rejects_outliers(self):
        scene, X, uv, valid = self._setup(noise=0.5, outlier_frac=0.25)
        R_gt, t_gt = scene.R[2], scene.t[2]
        xi = jnp.asarray([0.05, -0.05, 0.08, 0.02, -0.02, 0.01], jnp.float32)
        R0, t0 = geo.se3_retract(jnp.asarray(R_gt), jnp.asarray(t_gt), xi)
        res = pose_optimization(
            R0, t0, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(CFG.max_features), jnp.asarray(valid),
            CFG.fx, CFG.fy, CFG.cx, CFG.cy,
        )
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.2, ang
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.03
        # roughly the outliers are excluded
        assert int(res.n_inliers) < 0.85 * valid.sum()

    def test_jacobians_match_autodiff(self):
        """Analytic project_jacobians vs jax.jacfwd oracle (§7.1 rule 4)."""
        key = jax.random.PRNGKey(3)
        X = jax.random.uniform(key, (20, 3), minval=-2, maxval=2) + jnp.array(
            [0.0, 0.0, 6.0]
        )
        xi = jnp.asarray([0.1, 0.2, -0.1, 0.05, -0.08, 0.12], jnp.float32)
        R, t = geo.se3_exp(xi)
        _, _, J_pose, J_point = geo.project_jacobians(
            R, t, X, CFG.fx, CFG.fy, CFG.cx, CFG.cy
        )

        def proj_of_eps(eps, Xw):
            Rp, tp = geo.se3_retract(R, t, eps)
            uv, _ = geo.project(Rp, tp, Xw, CFG.fx, CFG.fy, CFG.cx, CFG.cy)
            return uv

        J_pose_ad = jax.vmap(
            lambda Xw: jax.jacfwd(lambda e: proj_of_eps(e, Xw))(jnp.zeros(6))
        )(X)
        J_point_ad = jax.vmap(
            lambda Xw: jax.jacfwd(lambda p: proj_of_eps(jnp.zeros(6), p))(Xw)
        )(X)
        np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_pose_ad), atol=1e-3)
        np.testing.assert_allclose(np.asarray(J_point), np.asarray(J_point_ad), atol=1e-3)
