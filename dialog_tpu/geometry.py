"""Lie-group geometry and camera models for the TPU SLAM engine.

TPU-native replacement for the reference's type-conversion + math substrate
(canonical layout: ``src/Converter.cc`` cv::Mat<->Eigen<->g2o conversions, and
g2o's ``SE3Quat``/``Sim3`` vertex types in
``Thirdparty/g2o/g2o/types/{types_six_dof_expmap.h,types_seven_dof_expmap.h}``
-- see SURVEY.md S2.1/S2.2). There is no conversion layer here because the whole
engine lives in one array world: every pose is an ``(R, t)`` pair of jnp arrays
(plus a scalar ``s`` for Sim3), every function is pure and `vmap`-batchable.

Conventions
-----------
* Poses are world->camera transforms ``T_cw``: ``X_c = R @ X_w + t`` (same
  convention as the reference pipeline's ``Tcw``).
* SE3 tangent vectors are ``xi = (rho, phi)`` with translation part first:
  ``se3_exp(xi) = (R=so3_exp(phi), t=J_l(phi) @ rho)``.
* Sim3 tangent vectors are ``(rho, phi, sigma)`` (7,) with scale last;
  ``s = exp(sigma)``.
* Quaternions are ``(w, x, y, z)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(phi):
    """Rodrigues formula with a small-angle-safe Taylor branch.

    phi: (..., 3) rotation vector -> (..., 3, 3) rotation matrix.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos t)/t^2, Taylor-stabilized near 0.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R):
    """Log map (..., 3, 3) -> (..., 3); safe at theta=0 and near pi.

    Autodiff-safe: every branch of each `where` evaluates to finite values
    *and* finite derivatives at every input (double-where trick), so this can
    sit inside `jax.jacfwd` — the pose-graph optimizer differentiates through
    it. `arccos` is avoided (infinite derivative at +-1).
    """
    skew = vee(R - jnp.swapaxes(R, -1, -2))      # 2 sin(theta) * axis
    s2 = jnp.sum(skew * skew, axis=-1)           # 4 sin^2(theta)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)

    small = s2 < 1e-10                           # theta near 0 or pi
    s2_safe = jnp.where(small, 1.0, s2)
    sin_t = 0.5 * jnp.sqrt(s2_safe)              # |sin theta| (safe grad)
    theta_g = jnp.arctan2(sin_t, cos_t)          # valid when not small
    # theta/(2 sin theta); Taylor 0.5 + theta^2/12 with theta^2 ~ s2/4
    scale = jnp.where(small, 0.5 + s2 / 48.0, theta_g / (2.0 * sin_t))
    w_generic = skew * scale[..., None]

    # Near-pi branch: axis from the largest column of R + I.
    B = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    col_norms2 = jnp.sum(B * B, axis=-2)
    col = jnp.argmax(col_norms2, axis=-1)
    axis = jnp.take_along_axis(B, col[..., None, None], axis=-1)[..., 0]
    axis = axis * jax.lax.rsqrt(jnp.sum(axis * axis, axis=-1, keepdims=True) + _EPS)
    sign = jnp.where(jnp.sum(skew * axis, axis=-1) < 0.0, -1.0, 1.0)
    theta_pi = jnp.arctan2(0.5 * jnp.sqrt(s2 + 1e-12), cos_t)
    w_pi = axis * (sign * theta_pi)[..., None]
    near_pi = cos_t < -0.999995
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(phi):
    """Left Jacobian J_l of SO(3): integrates translation in se3_exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + _EPS)) / (theta2 + _EPS),
    )
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * (W @ W)


# ---------------------------------------------------------------------------
# SE(3)  — poses as (R, t)
# ---------------------------------------------------------------------------


def se3_exp(xi):
    """xi = (rho, phi) (..., 6) -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R, t):
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", _so3_left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inv(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    return Rinv, -jnp.einsum("...ij,...j->...i", Rinv, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) o (Rb, tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, X):
    """Transform points X (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, X) + t


def se3_retract(R, t, xi):
    """Left-multiplicative update: T <- exp(xi) o T (the LM update used in BA)."""
    dR, dt = se3_exp(xi)
    return se3_compose(dR, dt, R, t)


def orthogonalize(R):
    """Project a near-rotation back onto SO(3) (two Newton iterations).

    R <- R (3I - R^T R)/2 converges quadratically for near-orthogonal input.
    Matmul-only (MXU-friendly) — used at solver entry/exit so that retraction
    chains cannot drift off the manifold (f32 error otherwise compounds
    geometrically through the velocity-prediction feedback loop).
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(2):
        R = R @ (1.5 * eye - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


# ---------------------------------------------------------------------------
# Sim(3) — (s, R, t)
# ---------------------------------------------------------------------------


def sim3_apply(s, R, t, X):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


def sim3_inv(s, R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rinv, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rinv, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def _sim3_W(phi, sigma):
    """The Sim3 'W' matrix coupling (rho, phi, sigma) -> translation.

    W = A*I + B*hat(phi) + C*hat(phi)^2 with the standard Sim3 coefficients
    (Strasdat's thesis / Sophus RxSO3 convention).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    sig2 = sigma * sigma

    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-8

    # A = (s - 1)/sigma
    A_generic = (s - 1.0) / jnp.where(small_sig, 1.0, sigma)
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, A_generic)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = sig2 + theta2
    denom = jnp.where(denom < 1e-12, 1.0, denom)

    # General case (sigma != 0, theta != 0):
    a_gc = s * sin_t
    b_gc = s * cos_t
    B_gen = (a_gc * sigma + (1.0 - b_gc) * theta) / (theta * denom)
    C_gen = (A - ((b_gc - 1.0) * sigma + a_gc * theta) / denom) / theta2

    # sigma -> 0 limits: B -> (1 - cos)/theta^2, C -> (theta - sin)/theta^3
    B_s0 = (1.0 - cos_t) / jnp.where(small_th, 1.0, theta2)
    C_s0 = (theta - sin_t) / jnp.where(small_th, 1.0, theta2 * theta)
    B_s0 = jnp.where(small_th, 0.5 - theta2 / 24.0, B_s0)
    C_s0 = jnp.where(small_th, 1.0 / 6.0 - theta2 / 120.0, C_s0)

    # theta -> 0 limits (sigma != 0): B -> (sigma*s - s + 1)/sigma^2,
    # C -> (s*sigma^2/2 - s*sigma + s - 1)/sigma^3  [series-safe]
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    B_t0 = ((sigma - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    C_t0 = ((0.5 * sig2 - sigma + 1.0) * s - 1.0) / (safe_sig * safe_sig * safe_sig)
    B_t0 = jnp.where(small_sig, 0.5 + sigma / 3.0, B_t0)
    C_t0 = jnp.where(small_sig, 1.0 / 6.0 + sigma / 8.0, C_t0)

    B = jnp.where(small_sig, B_s0, jnp.where(small_th, B_t0, B_gen))
    C = jnp.where(small_sig, C_s0, jnp.where(small_th, C_t0, C_gen))

    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * (
        W @ W
    )


def sim3_exp(xi):
    """xi = (rho, phi, sigma) (..., 7) -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _sim3_W(phi, sigma), rho)
    return s, R, t


def sim3_log(s, R, t):
    sigma = jnp.log(s)
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_retract(s, R, t, xi):
    ds, dR, dt = sim3_exp(xi)
    return sim3_compose(ds, dR, dt, s, R, t)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_normalize(q):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_mat(q):
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """Branchless Shepperd's method: pick the largest of four candidates."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_i^2 values
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate assuming w largest
    sw = safe_sqrt(qw2) * 0.5
    cand_w = jnp.stack(
        [2 * sw, (m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw), (m10 - m01) / (2 * sw)],
        axis=-1,
    ) * 0.5
    sx = safe_sqrt(qx2) * 0.5
    cand_x = jnp.stack(
        [(m21 - m12) / (2 * sx), 2 * sx, (m01 + m10) / (2 * sx), (m02 + m20) / (2 * sx)],
        axis=-1,
    ) * 0.5
    sy = safe_sqrt(qy2) * 0.5
    cand_y = jnp.stack(
        [(m02 - m20) / (2 * sy), (m01 + m10) / (2 * sy), 2 * sy, (m12 + m21) / (2 * sy)],
        axis=-1,
    ) * 0.5
    sz = safe_sqrt(qz2) * 0.5
    cand_z = jnp.stack(
        [(m10 - m01) / (2 * sz), (m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz), 2 * sz],
        axis=-1,
    ) * 0.5

    vals = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(vals, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    # Canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Camera models
# ---------------------------------------------------------------------------


def project(R, t, X, fx, fy, cx, cy):
    """Project world points through T_cw into pixels.

    Returns (uv (..., 2), z (...,)) -- z is the camera-frame depth (cheirality).
    """
    Xc = se3_apply(R, t, X)
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[..., 0] / zs + cx
    v = fy * Xc[..., 1] / zs + cy
    return jnp.stack([u, v], axis=-1), z


def project_jacobians(R, t, X, fx, fy, cx, cy):
    """Residual-model Jacobians for reprojection BA.

    Observation model: uv_hat = pi(exp(xi) o T_cw @ X_w), residual r = uv_hat - uv.
    Returns (uv, z, J_pose (..., 2, 6), J_point (..., 2, 3)) where J_pose is wrt
    the left-multiplicative twist xi=(rho, phi) and J_point wrt X_w.
    """
    Xc = se3_apply(R, t, X)
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    uv = jnp.stack([u, v], axis=-1)

    # d(uv)/d(Xc): (..., 2, 3)
    zero = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    # d(Xc)/d(xi) for left perturbation: [I | -hat(Xc)]
    J_xc_pose = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Xc.shape + (3,)), -hat(Xc)],
        axis=-1,
    )
    J_pose = J_proj @ J_xc_pose  # (..., 2, 6)
    J_point = J_proj @ R  # (..., 2, 3)
    return uv, z, J_pose, J_point


def stereo_project_jacobians(R, t, X, fx, fy, cx, cy, bf):
    """Stereo residual-model Jacobians: observation (u, v, uR).

    Returns (uvr (..., 3), z, J_pose (..., 3, 6), J_point (..., 3, 3)).
    Reference: g2o EdgeStereoSE3ProjectXYZOnlyPose's linearizeOplus.
    """
    Xc = se3_apply(R, t, X)
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    uR = u - bf * inv_z
    uvr = jnp.stack([u, v, uR], axis=-1)
    zero = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1),
            jnp.stack(
                [fx * inv_z, zero, -fx * x * inv_z2 + bf * inv_z2], axis=-1
            ),
        ],
        axis=-2,
    )  # (..., 3, 3) d(u,v,uR)/dXc
    J_xc_pose = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Xc.shape + (3,)), -hat(Xc)],
        axis=-1,
    )
    J_pose = J_proj @ J_xc_pose
    J_point = J_proj @ R
    return uvr, z, J_pose, J_point


def stereo_project(R, t, X, fx, fy, cx, cy, bf):
    """Stereo projection: returns ((u, v, uR), z). uR = u - bf/z."""
    uv, z = project(R, t, X, fx, fy, cx, cy)
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uR = uv[..., 0] - bf / zs
    return jnp.concatenate([uv, uR[..., None]], axis=-1), z


def backproject(uv, z, fx, fy, cx, cy):
    """Pixel + depth -> camera-frame 3D point."""
    x = (uv[..., 0] - cx) / fx * z
    y = (uv[..., 1] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


def distort_radtan(xn, k1, k2, p1, p2, k3=0.0):
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(uv, fx, fy, cx, cy, k1, k2, p1, p2, k3=0.0, iters=8):
    """Iteratively undistort pixel coords (fixed-point, as cv::undistortPoints).

    Replaces the reference's ``Frame::UndistortKeyPoints`` (canonical
    src/Frame.cc) OpenCV call with a jit-friendly fixed-iteration loop.
    """
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    def body(_, xn):
        d = distort_radtan(xn, k1, k2, p1, p2, k3) - xn
        return xd - d

    xn = jax.lax.fori_loop(0, iters, body, xd)
    return jnp.stack([xn[..., 0] * fx + cx, xn[..., 1] * fy + cy], axis=-1)


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------


def triangulate_linear(R1, t1, R2, t2, uv1n, uv2n):
    """DLT triangulation of normalized image coords from two views.

    uv*n are *normalized* coords ((u-cx)/fx, (v-cy)/fy), (..., 2).
    Returns world points (..., 3). Batched closed-form 4x4 SVD-free solve via
    normal equations on the 4x3 system (fast, adequate with the later BA).
    """
    # Rows of A x = b from u * (P row3) - (P row1) etc., P = [R | t]
    def rows(R, t, uvn):
        u, v = uvn[..., 0], uvn[..., 1]
        r1, r2, r3 = R[..., 0, :], R[..., 1, :], R[..., 2, :]
        t1_, t2_, t3_ = t[..., 0], t[..., 1], t[..., 2]
        a1 = u[..., None] * r3 - r1
        b1 = -(u * t3_ - t1_)
        a2 = v[..., None] * r3 - r2
        b2 = -(v * t3_ - t2_)
        return jnp.stack([a1, a2], axis=-2), jnp.stack([b1, b2], axis=-1)

    A1, b1 = rows(R1, t1, uv1n)
    A2, b2 = rows(R2, t2, uv2n)
    A = jnp.concatenate([A1, A2], axis=-2)  # (..., 4, 3)
    b = jnp.concatenate([b1, b2], axis=-1)  # (..., 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    Atb = jnp.einsum("...ji,...j->...i", A, b)
    AtA = AtA + 1e-9 * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Alignment (Horn/Umeyama) — used by Sim3 solver and the ATE evaluator
# ---------------------------------------------------------------------------


def umeyama_alignment(src, dst, weights=None, with_scale=True):
    """Weighted Umeyama: find (s, R, t) minimizing ||dst - (s R src + t)||^2.

    src, dst: (N, 3). weights: (N,) nonnegative. Returns (s, R, t).
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / (jnp.sum(weights) + _EPS)
    mu_s = jnp.sum(w[:, None] * src, axis=0)
    mu_d = jnp.sum(w[:, None] * dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc  # (3, 3)
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=src.dtype) * jnp.stack([1.0, 1.0, d]))
    R = U @ D @ Vt
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
    s = jnp.where(
        with_scale,
        jnp.sum(S * jnp.diagonal(D)) / (var_s + _EPS),
        1.0,
    )
    t = mu_d - s * R @ mu_s
    return s, R, t
