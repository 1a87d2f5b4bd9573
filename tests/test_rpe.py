"""RPE + KITTI odometry metrics (the reference's external evaluators:
TUM evaluate_rpe.py and the KITTI devkit — SURVEY.md §4)."""

import numpy as np

from dialog_tpu import geometry as geo
from dialog_tpu.eval.rpe import kitti_odometry_errors, rpe, rpe_rmse

import jax.numpy as jnp


def _straight_traj(n, step=1.0):
    R = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    t = np.zeros((n, 3), np.float32)
    t[:, 2] = -np.arange(n) * step   # world->cam: camera advances along +z
    return R, t


class TestRPE:
    def test_zero_on_identical(self):
        R, t = _straight_traj(20)
        tr, ro = rpe(R, t, R, t, delta=1)
        assert np.allclose(tr, 0) and np.allclose(ro, 0)

    def test_constant_translation_drift(self):
        """Est moves 1.01 m per frame vs gt 1.0 -> RPE trans = 0.01 at d=1."""
        gt_R, gt_t = _straight_traj(30, step=1.0)
        est_R, est_t = _straight_traj(30, step=1.01)
        tr, ro = rpe(est_R, est_t, gt_R, gt_t, delta=1)
        np.testing.assert_allclose(tr, 0.01, atol=1e-5)
        assert np.allclose(ro, 0, atol=1e-6)
        t5, _ = rpe_rmse(est_R, est_t, gt_R, gt_t, delta=5)
        np.testing.assert_allclose(t5, 0.05, atol=1e-4)

    def test_rotation_drift(self):
        gt_R, gt_t = _straight_traj(10)
        est_R = gt_R.copy()
        phi = 0.02
        for i in range(10):
            est_R[i] = np.asarray(
                geo.so3_exp(jnp.asarray([0.0, phi * i, 0.0]))
            ) @ gt_R[i]
        _, ro = rpe(est_R, gt_t.copy(), gt_R, gt_t, delta=1)
        np.testing.assert_allclose(ro, phi, atol=1e-5)


class TestKittiOdometry:
    def test_scale_error_gives_translation_percent(self):
        """1% scale error -> ~1% devkit translation error, ~0 rotation."""
        n = 1200
        gt_R, gt_t = _straight_traj(n, step=1.0)       # 1.2 km straight
        est_R, est_t = _straight_traj(n, step=1.01)
        t_err, r_err, n_seg = kitti_odometry_errors(
            est_R, est_t, gt_R, gt_t
        )
        assert n_seg > 100
        np.testing.assert_allclose(t_err, 0.01, rtol=0.05)
        assert r_err < 1e-6

    def test_too_short_returns_zero_segments(self):
        gt_R, gt_t = _straight_traj(50, step=1.0)      # 50 m < 100 m
        t_err, r_err, n_seg = kitti_odometry_errors(gt_R, gt_t, gt_R, gt_t)
        assert n_seg == 0
