"""Two-view monocular initialization: fully batched H/F RANSAC.

Replaces the reference's initializer (canonical ``src/Initializer.cc`` —
SURVEY.md §2.1): 200 sequential RANSAC iterations split across two CPU
threads (homography and fundamental in parallel) become *one device call*
that solves and scores every hypothesis for both models at once (SURVEY.md
§7.1 rule 3). Model selection RH = SH/(SH+SF) > 0.40 and the reconstruction
census (cheirality + parallax + reprojection checks over all candidate
motions) follow the reference's logic; the Faugeras 8-motion homography
decomposition and the 4-motion essential-matrix decomposition are evaluated
together as one batched candidate set.

All inputs are fixed-capacity arrays with validity masks; everything jits.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_GAMMA = 5.991  # reference: both models accumulate (gamma - chi2)


class TwoViewResult(NamedTuple):
    success: jax.Array      # bool scalar
    R: jax.Array            # f32[3, 3]  cam1 -> cam2
    t: jax.Array            # f32[3]     unit norm
    points: jax.Array       # f32[N, 3]  triangulated in cam1 frame
    good: jax.Array         # bool[N]    triangulated & passed all checks
    used_h: jax.Array       # bool scalar (homography branch chosen)
    n_good: jax.Array       # i32 scalar


def _hartley_normalize(pts, mask):
    """Similarity-normalize points to zero mean / unit avg abs-dev (masked)."""
    w = mask.astype(pts.dtype)
    n = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / n[..., None]
    d = jnp.sum(jnp.abs(pts - mean) * w[..., None], axis=-2, keepdims=True) / n[..., None]
    s = 1.0 / (d + 1e-9)
    return (pts - mean) * s, mean[..., 0, :], s[..., 0, :]


def _denorm_T(mean, s):
    """Build the 3x3 normalization matrix T with x' = s*(x - mean)."""
    sx, sy = s[..., 0], s[..., 1]
    mx, my = mean[..., 0], mean[..., 1]
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [
            jnp.stack([sx, z, -sx * mx], axis=-1),
            jnp.stack([z, sy, -sy * my], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def _solve_f(p1, p2):
    """Normalized 8-point: p1, p2 [..., 8, 2] pixel coords -> F [..., 3, 3]."""
    m = jnp.ones(p1.shape[:-1], bool)
    n1, mu1, s1 = _hartley_normalize(p1, m)
    n2, mu2, s2 = _hartley_normalize(p2, m)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )  # [..., 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    f = Vt[..., -1, :]
    Fn = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 enforcement
    U, S, Vt2 = jnp.linalg.svd(Fn)
    S = S.at[..., 2].set(0.0)
    Fn = U @ (S[..., None] * Vt2)
    T1 = _denorm_T(mu1, s1)
    T2 = _denorm_T(mu2, s2)
    return jnp.swapaxes(T2, -1, -2) @ Fn @ T1


def _solve_h(p1, p2):
    """Normalized DLT from 4 correspondences -> H [..., 3, 3] (x2 ~ H x1)."""
    m = jnp.ones(p1.shape[:-1], bool)
    n1, mu1, s1 = _hartley_normalize(p1, m)
    n2, mu2, s2 = _hartley_normalize(p2, m)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    h = Vt[..., -1, :]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    T1 = _denorm_T(mu1, s1)
    T2 = _denorm_T(mu2, s2)
    return jnp.linalg.solve(T2, Hn @ T1)


def _apply_h(H, p):
    """H [..., 3, 3] applied to pixel points p [..., N, 2]."""
    ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", H, ph)
    return q[..., :2] / (q[..., 2:3] + 1e-12)


def _score_h(H, p1, p2, valid, sigma2):
    """Symmetric transfer score (reference: CheckHomography)."""
    Hinv = jnp.linalg.inv(H)
    e12 = jnp.sum((p1 - _apply_h(Hinv[..., None, :, :].squeeze(-3), p2)) ** 2, -1) / sigma2
    e21 = jnp.sum((p2 - _apply_h(H[..., None, :, :].squeeze(-3), p1)) ** 2, -1) / sigma2
    in12 = (e12 < CHI2_H) & valid
    in21 = (e21 < CHI2_H) & valid
    score = jnp.sum(jnp.where(in12, CHI2_H - e12, 0.0), -1) + jnp.sum(
        jnp.where(in21, CHI2_H - e21, 0.0), -1
    )
    return score, in12 & in21


def _score_f(F, p1, p2, valid, sigma2):
    """Epipolar point-line score both directions (reference: CheckFundamental)."""
    ph1 = jnp.concatenate([p1, jnp.ones(p1.shape[:-1] + (1,), p1.dtype)], axis=-1)
    ph2 = jnp.concatenate([p2, jnp.ones(p2.shape[:-1] + (1,), p2.dtype)], axis=-1)
    l2 = jnp.einsum("...ij,nj->...ni", F, ph1)           # line in image 2
    l1 = jnp.einsum("...ji,nj->...ni", F, ph2)           # line in image 1
    d2 = jnp.einsum("...ni,ni->...n", l2, ph2) ** 2 / (
        l2[..., 0] ** 2 + l2[..., 1] ** 2 + 1e-12
    )
    d1 = jnp.einsum("...ni,ni->...n", l1, ph1) ** 2 / (
        l1[..., 0] ** 2 + l1[..., 1] ** 2 + 1e-12
    )
    c1, c2 = d1 / sigma2, d2 / sigma2
    in1 = (c1 < CHI2_F) & valid
    in2 = (c2 < CHI2_F) & valid
    score = jnp.sum(jnp.where(in1, SCORE_GAMMA - c1, 0.0), -1) + jnp.sum(
        jnp.where(in2, SCORE_GAMMA - c2, 0.0), -1
    )
    return score, in1 & in2


def _decompose_E(E):
    """E -> 4 candidate (R [4,3,3], t [4,3]) with |t| = 1."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / (jnp.linalg.norm(t) + 1e-12)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _decompose_H(Hn):
    """Faugeras 1988 SVD decomposition of a calibrated homography.

    Hn = K^-1 H K. Returns 8 candidate (R [8,3,3], t [8,3]) motions
    (normal vectors are not needed downstream; the census picks the motion).
    """
    U, d, Vt = jnp.linalg.svd(Hn)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    x1 = jnp.array([aux1, aux1, -aux1, -aux1])
    x3 = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' = +d2
    st = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    stheta = jnp.array([st, -st, -st, st])

    def make_pos(i):
        Rp = jnp.array(
            [
                [ct, 0.0, -stheta[i]],
                [0.0, 1.0, 0.0],
                [stheta[i], 0.0, ct],
            ]
        )
        tp = (d1 - d3) * jnp.array([x1[i], 0.0, -x3[i]])
        return s * U @ Rp @ Vt, U @ tp

    # case d' = -d2
    sp = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphi = jnp.array([sp, -sp, -sp, sp])

    def make_neg(i):
        Rp = jnp.array(
            [
                [cp, 0.0, sphi[i]],
                [0.0, -1.0, 0.0],
                [sphi[i], 0.0, -cp],
            ]
        )
        tp = (d1 + d3) * jnp.array([x1[i], 0.0, x3[i]])
        return s * U @ Rp @ Vt, U @ tp

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = make_neg(i)
        Rs.append(R)
        ts.append(t)
    R = jnp.stack(Rs)
    t = jnp.stack(ts)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    return R, t


def _check_rt(R, t, x1n, x2n, valid, fx, reproj_th2):
    """Triangulation census for one candidate motion (reference: CheckRT).

    x*n: normalized camera coords [N, 2]. Returns (n_good, good mask,
    parallax-ok count, points [N, 3] in cam1 frame).
    """
    eye = jnp.eye(3, dtype=R.dtype)
    zero = jnp.zeros((3,), R.dtype)
    X = geo.triangulate_linear(eye, zero, R, t, x1n, x2n)
    z1 = X[..., 2]
    Xc2 = geo.se3_apply(R, t, X)
    z2 = Xc2[..., 2]
    # parallax between viewing rays
    o2 = -R.T @ t
    r1 = X
    r2 = X - o2
    cosp = jnp.sum(r1 * r2, -1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    # reprojection errors (in normalized coords, scaled to pixels by fx)
    e1 = jnp.sum((X[..., :2] / (z1[..., None] + 1e-12) - x1n) ** 2, -1) * fx * fx
    e2 = jnp.sum((Xc2[..., :2] / (z2[..., None] + 1e-12) - x2n) ** 2, -1) * fx * fx
    finite = jnp.all(jnp.isfinite(X), -1)
    good = (
        valid
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & (cosp < 0.99998)      # parallax > ~0.36 deg
        & (e1 < reproj_th2)
        & (e2 < reproj_th2)
    )
    return jnp.sum(good), good, X


@functools.partial(jax.jit, static_argnames=("iters",))
def initialize_two_view(
    uv1: jax.Array,
    uv2: jax.Array,
    valid: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    key: jax.Array,
    iters: int = 256,
    sigma: float = 1.0,
    min_good: int = 50,
) -> TwoViewResult:
    """Estimate relative pose from matched undistorted pixel coords.

    uv1/uv2: f32[N, 2] matched pairs (uv1[i] <-> uv2[i]); valid: bool[N].
    Returns pose of camera 2 in camera-1 frame convention T_21 (R, t):
    X_2 = R @ X_1 + t, |t| = 1 (monocular scale is free).
    """
    N = uv1.shape[0]
    sigma2 = sigma * sigma
    n_valid = jnp.sum(valid.astype(jnp.int32))
    vidx, = jnp.nonzero(valid, size=N, fill_value=0)

    # --- batched minimal sets -----------------------------------------
    key_f, key_h = jax.random.split(key)
    pick_f = jax.random.randint(key_f, (iters, 8), 0, jnp.maximum(n_valid, 1))
    pick_h = jax.random.randint(key_h, (iters, 4), 0, jnp.maximum(n_valid, 1))
    sets_f1, sets_f2 = uv1[vidx[pick_f]], uv2[vidx[pick_f]]
    sets_h1, sets_h2 = uv1[vidx[pick_h]], uv2[vidx[pick_h]]

    F_all = _solve_f(sets_f1, sets_f2)               # [iters, 3, 3]
    H_all = _solve_h(sets_h1, sets_h2)               # [iters, 3, 3]

    score_f, _ = jax.vmap(lambda F: _score_f(F, uv1, uv2, valid, sigma2))(F_all)
    score_h, _ = jax.vmap(lambda H: _score_h(H, uv1, uv2, valid, sigma2))(H_all)

    bf = jnp.argmax(score_f)
    bh = jnp.argmax(score_h)
    SF, SH = score_f[bf], score_h[bh]
    F = F_all[bf]
    H = H_all[bh]
    _, inl_f = _score_f(F, uv1, uv2, valid, sigma2)
    _, inl_h = _score_h(H, uv1, uv2, valid, sigma2)

    RH = SH / (SH + SF + 1e-9)
    use_h = RH > 0.40

    # --- candidate motions (evaluate all 12; mask the losing family) --
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
    Kinv = jnp.linalg.inv(K)
    E = K.T @ F @ K
    R_e, t_e = _decompose_E(E)                        # [4, ...]
    Hn = Kinv @ H @ K
    R_h, t_h = _decompose_H(Hn)                       # [8, ...]
    R_cand = jnp.concatenate([R_e, R_h])              # [12, 3, 3]
    t_cand = jnp.concatenate([t_e, t_h])
    from_h = jnp.concatenate([jnp.zeros(4, bool), jnp.ones(8, bool)])
    cand_ok = jnp.where(use_h, from_h, ~from_h)

    x1n = (uv1 - jnp.array([cx, cy])) / jnp.array([fx, fy])
    x2n = (uv2 - jnp.array([cx, cy])) / jnp.array([fx, fy])
    model_inl = jnp.where(use_h, inl_h, inl_f)
    reproj_th2 = 4.0 * sigma2

    counts, goods, points = jax.vmap(
        lambda R, t: _check_rt(R, t, x1n, x2n, model_inl, fx, reproj_th2)
    )(R_cand, t_cand)
    counts = jnp.where(cand_ok, counts, -1)
    best = jnp.argmax(counts)
    best_n = counts[best]
    second_n = jnp.max(jnp.where(jnp.arange(12) == best, -1, counts))

    n_inl = jnp.sum(model_inl.astype(jnp.int32))
    success = (
        (best_n >= min_good)
        & (best_n.astype(jnp.float32) > 0.75 * n_inl.astype(jnp.float32))
        & (second_n.astype(jnp.float32) < 0.90 * best_n.astype(jnp.float32))
    )
    return TwoViewResult(
        success=success,
        R=R_cand[best],
        t=t_cand[best],
        points=points[best],
        good=goods[best],
        used_h=use_h,
        n_good=best_n,
    )
