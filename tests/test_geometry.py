"""Geometry unit tests: round-trips and oracles vs scipy (SURVEY.md §7.6)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from dialog_tpu import geometry as G

RNG = np.random.default_rng(0)


def rand_rotvecs(n, scale=2.0):
    return RNG.normal(size=(n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rand_rotvecs(64)
        R = np.asarray(G.so3_exp(jnp.asarray(w, jnp.float32)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = rand_rotvecs(64, scale=1.0)
        # log(exp(w)) == w only on the principal branch ||w|| < pi.
        norms = np.linalg.norm(w, axis=-1, keepdims=True)
        w = w / norms * np.minimum(norms, np.pi - 0.05)
        w2 = np.asarray(G.so3_log(G.so3_exp(jnp.asarray(w, jnp.float32))))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_log_small_angle(self):
        w = rand_rotvecs(16, scale=1e-5)
        R = Rotation.from_rotvec(w).as_matrix()
        w2 = np.asarray(G.so3_log(jnp.asarray(R, jnp.float32)))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_log_near_pi(self):
        axes = RNG.normal(size=(16, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = axes * (np.pi - 1e-4)
        R = Rotation.from_rotvec(w).as_matrix()
        w2 = np.asarray(G.so3_log(jnp.asarray(R, jnp.float32)))
        R2 = Rotation.from_rotvec(np.asarray(w2)).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(size=(32, 6)).astype(np.float32)
        R, t = G.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(G.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_inverse_compose_identity(self):
        xi = jnp.asarray(RNG.normal(size=(8, 6)), jnp.float32)
        R, t = G.se3_exp(xi)
        Ri, ti = G.se3_inv(R, t)
        Rc, tc = G.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)

    def test_retract_zero_is_identity(self):
        xi = jnp.asarray(RNG.normal(size=(4, 6)), jnp.float32)
        R, t = G.se3_exp(xi)
        R2, t2 = G.se3_retract(R, t, jnp.zeros((4, 6), jnp.float32))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(size=(32, 7)).astype(np.float32) * 0.5
        s, R, t = G.sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(G.sim3_log(s, R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_sigma_zero_matches_se3(self):
        xi6 = RNG.normal(size=(8, 6)).astype(np.float32)
        xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], axis=-1)
        s, R, t = G.sim3_exp(jnp.asarray(xi7))
        R_se, t_se = G.se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_se), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_se), atol=1e-4)

    def test_compose_inverse(self):
        xi = jnp.asarray(RNG.normal(size=(8, 7)) * 0.4, jnp.float32)
        s, R, t = G.sim3_exp(xi)
        si, Ri, ti = G.sim3_inv(s, R, t)
        sc, Rc, tc = G.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-4)

    def test_apply(self):
        X = jnp.asarray(RNG.normal(size=(5, 3)), jnp.float32)
        s = jnp.asarray(2.0)
        R = G.so3_exp(jnp.asarray([0.1, 0.2, 0.3], jnp.float32))
        t = jnp.asarray([1.0, -1.0, 0.5], jnp.float32)
        Y = G.sim3_apply(s, R, t, X)
        Y_ref = 2.0 * np.asarray(X) @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(Y), Y_ref, atol=1e-5)


class TestQuat:
    def test_mat_quat_roundtrip(self):
        w = rand_rotvecs(64)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        q = G.mat_to_quat(jnp.asarray(R))
        R2 = np.asarray(G.quat_to_mat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_mul_matches_matmul(self):
        wa, wb = rand_rotvecs(16), rand_rotvecs(16)
        Ra = Rotation.from_rotvec(wa).as_matrix().astype(np.float32)
        Rb = Rotation.from_rotvec(wb).as_matrix().astype(np.float32)
        qa, qb = G.mat_to_quat(jnp.asarray(Ra)), G.mat_to_quat(jnp.asarray(Rb))
        q_ab = G.quat_mul(qa, qb)
        R_ab = np.asarray(G.quat_to_mat(q_ab))
        np.testing.assert_allclose(R_ab, Ra @ Rb, atol=1e-4)


class TestCamera:
    FX, FY, CX, CY = 500.0, 505.0, 320.0, 240.0

    def test_project_backproject(self):
        X = RNG.normal(size=(64, 3)).astype(np.float32)
        X[:, 2] = np.abs(X[:, 2]) + 1.0
        R = jnp.eye(3)
        t = jnp.zeros(3)
        uv, z = G.project(R, t, jnp.asarray(X), self.FX, self.FY, self.CX, self.CY)
        X2 = np.asarray(G.backproject(uv, z, self.FX, self.FY, self.CX, self.CY))
        np.testing.assert_allclose(X2, X, atol=1e-4)

    def test_project_jacobians_match_autodiff(self):
        xi = jnp.asarray(RNG.normal(size=6) * 0.3, jnp.float32)
        R, t = G.se3_exp(xi)
        X = jnp.asarray([0.3, -0.2, 2.5], jnp.float32)

        uv, z, J_pose, J_point = G.project_jacobians(
            R, t, X, self.FX, self.FY, self.CX, self.CY
        )

        def f_pose(eps):
            dR, dt = G.se3_exp(eps)
            R2, t2 = G.se3_compose(dR, dt, R, t)
            return G.project(R2, t2, X, self.FX, self.FY, self.CX, self.CY)[0]

        def f_point(Xp):
            return G.project(R, t, Xp, self.FX, self.FY, self.CX, self.CY)[0]

        J_pose_ad = jax.jacfwd(f_pose)(jnp.zeros(6, jnp.float32))
        J_point_ad = jax.jacfwd(f_point)(X)
        np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_pose_ad), atol=1e-3)
        np.testing.assert_allclose(np.asarray(J_point), np.asarray(J_point_ad), atol=1e-3)

    def test_undistort_roundtrip(self):
        k1, k2, p1, p2 = 0.26, -0.95, -0.005, 0.0026
        uv_true = RNG.uniform(low=[100, 100], high=[540, 380], size=(64, 2)).astype(
            np.float32
        )
        xn = jnp.stack(
            [(uv_true[:, 0] - self.CX) / self.FX, (uv_true[:, 1] - self.CY) / self.FY],
            axis=-1,
        )
        xd = G.distort_radtan(xn, k1, k2, p1, p2)
        uv_dist = jnp.stack(
            [xd[:, 0] * self.FX + self.CX, xd[:, 1] * self.FY + self.CY], axis=-1
        )
        uv_rec = np.asarray(
            G.undistort_points(
                uv_dist, self.FX, self.FY, self.CX, self.CY, k1, k2, p1, p2, iters=10
            )
        )
        np.testing.assert_allclose(uv_rec, uv_true, atol=0.05)


class TestTriangulation:
    def test_two_view_exact(self):
        X = RNG.normal(size=(32, 3)).astype(np.float32)
        X[:, 2] = np.abs(X[:, 2]) + 4.0
        R1, t1 = jnp.eye(3), jnp.zeros(3)
        xi = jnp.asarray([0.5, 0.05, 0.02, 0.02, -0.3, 0.01], jnp.float32)
        R2, t2 = G.se3_exp(xi)
        Xj = jnp.asarray(X)

        def norm_coords(R, t, X):
            Xc = G.se3_apply(R, t, X)
            return Xc[..., :2] / Xc[..., 2:3]

        uv1 = norm_coords(R1, t1, Xj)
        uv2 = norm_coords(R2, t2, Xj)
        Xr = np.asarray(G.triangulate_linear(R1, t1, R2, t2, uv1, uv2))
        np.testing.assert_allclose(Xr, X, atol=1e-2)


class TestUmeyama:
    def test_recovers_similarity(self):
        X = RNG.normal(size=(100, 3)).astype(np.float32)
        s_true = 1.7
        R_true = Rotation.from_rotvec([0.3, -0.5, 0.8]).as_matrix().astype(np.float32)
        t_true = np.array([2.0, -1.0, 0.3], np.float32)
        Y = s_true * X @ R_true.T + t_true
        s, R, t = G.umeyama_alignment(jnp.asarray(X), jnp.asarray(Y))
        np.testing.assert_allclose(float(s), s_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)

    def test_no_scale(self):
        X = RNG.normal(size=(50, 3)).astype(np.float32)
        R_true = Rotation.from_rotvec([0.1, 0.2, -0.4]).as_matrix().astype(np.float32)
        t_true = np.array([1.0, 2.0, 3.0], np.float32)
        Y = X @ R_true.T + t_true
        s, R, t = G.umeyama_alignment(jnp.asarray(X), jnp.asarray(Y), with_scale=False)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
