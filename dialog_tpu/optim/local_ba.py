"""Windowed bundle adjustment with blocked Schur complement — the core solver.

Replaces the reference's ``Optimizer::LocalBundleAdjustment`` and the g2o
block solver underneath it (canonical ``src/Optimizer.cc`` +
``Thirdparty/g2o`` BlockSolver_6_3 — SURVEY.md §2.1/§2.2). The structure is
the classic SLAM Schur trick, laid out for the TPU (SURVEY.md §2.3):

* The optimization window is the covisibility neighborhood of a center
  keyframe; other keyframes observing the window's landmarks contribute
  residuals with frozen poses (their pose Jacobians are zeroed).
* Observations are bucketed per landmark into fixed-width lists
  ``[P, O_max]`` (built with one sort + searchsorted), so every LM iteration
  is dense batched math: residuals/Jacobians for all observations at once,
  per-landmark 3x3 ``Hll`` inverses, and the camera-system reduction
  ``S = Hcc - sum_l Y_l Hll_l^-1 Y_l^T`` as one einsum + scatter-add over
  landmark observation pairs.
* The reduced camera system (6C x 6C, C <= ~64) is solved densely — it is
  tiny. Landmark updates come from back-substitution.

The same kernel generalizes to global BA by sharding the landmark axis
(``optim/global_ba.py``); `jax.jacfwd` oracles live in the tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry as geo
from ..config import EngineConfig
from ..containers import INVALID_ID, MapState
from .lm import all_finite, chol3x3, huber_weight, tri_inv3x3_lower


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem extracted from a MapState."""

    cam_slots: jax.Array   # i32[C]  keyframe slot per camera (K = invalid)
    cam_opt: jax.Array     # bool[C] optimized (True) vs frozen (False)
    R: jax.Array           # f32[C, 3, 3]
    t: jax.Array           # f32[C, 3]
    lm_ids: jax.Array      # i32[P]  landmark slot per local landmark (L = pad)
    xyz: jax.Array         # f32[P, 3]
    obs_cam: jax.Array     # i32[P, O] camera index per observation (C = pad)
    obs_uv: jax.Array      # f32[P, O, 2]
    obs_w: jax.Array       # f32[P, O] information (inv sigma2)
    obs_ok: jax.Array      # bool[P, O]
    obs_feat: jax.Array    # i32[P, O] feature index (for outlier write-back)
    # stereo right-x per observation; < 0 = monocular observation. None (the
    # default) means a mono-only problem: residuals stay 2-row (u, v). When
    # present and cfg.bf > 0, observations with obs_ur >= 0 contribute the
    # 3-row (u, v, uR) residual of g2o's EdgeStereoSE3ProjectXYZ — the
    # reference's LocalBundleAdjustment/GBA stereo edges (VERDICT r4 #2).
    obs_ur: jax.Array | None = None
    # optional landmark freeze mask (None = all optimized): frozen landmarks
    # have their point Jacobians zeroed, so their observations become exact
    # pose-only edges (g2o's setFixed on point vertices). Block-partitioned
    # BA uses this for landmarks owned by other blocks.
    lm_opt: jax.Array | None = None


def dedupe_row_landmarks(li: jax.Array, P: int) -> jax.Array:
    """Keep only the FIRST feature per (camera row, landmark) in li [C, F].

    Landmark fusion's global replace can bind two features of one keyframe
    to the same winning landmark (mapping.fuse_landmarks_into_kf); the
    rank-by-presence bucketing below assumes at most one (ADVICE r4).
    ``P`` is the sentinel for "no landmark"."""
    C, F = li.shape
    feat_ids = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :], (C, F))
    cam_rows = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, F))
    first_feat = jnp.full((C, P + 1), F, jnp.int32).at[cam_rows, li].min(feat_ids)
    return jnp.where(
        (li >= P) | (feat_ids == first_feat[cam_rows, li]), li, P
    )


def bucket_observations(li: jax.Array, P: int, O: int):
    """Pack per-camera landmark bindings li [C, F] into fixed-width
    per-landmark observation lists.

    A feature's slot in its landmark's list = how many EARLIER cameras
    observe that landmark (rank-by-presence cumsum — one scatter instead of
    an argsort over [C*F], the costliest op class on TPU). Requires at most
    one feature per landmark per row (``dedupe_row_landmarks``).

    Returns (obs_cam i32[P, O] (C = pad), obs_feat i32[P, O],
    obs_ok bool[P, O], n_over) — n_over counts observations beyond the O
    cap (SURVEY.md §5 "no silent caps")."""
    C, F = li.shape
    flat_idx = (
        jnp.arange(C, dtype=jnp.int32)[:, None] * (P + 1) + li
    ).reshape(-1)
    pres = (
        jnp.zeros((C * (P + 1),), jnp.int32).at[flat_idx].add(1)
    ).reshape(C, P + 1)
    rank_tab = jnp.cumsum(pres, axis=0) - pres             # exclusive over C
    rank = rank_tab.reshape(-1)[flat_idx].reshape(C, F)
    keep = (li < P) & (rank < O)
    n_over = jnp.sum((li < P) & (rank >= O))
    tgt_l = jnp.where(keep, li, P).reshape(-1)
    tgt_o = jnp.where(keep, rank, 0).reshape(-1)
    cam_of = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[:, None], (C, F)
    ).reshape(-1)
    feat_of = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[None, :], (C, F)
    ).reshape(-1)
    obs_cam = jnp.full((P, O), C, jnp.int32).at[tgt_l, tgt_o].set(
        cam_of, mode="drop"
    )
    obs_feat = jnp.zeros((P, O), jnp.int32).at[tgt_l, tgt_o].set(
        feat_of, mode="drop"
    )
    obs_ok = jnp.zeros((P, O), bool).at[tgt_l, tgt_o].set(
        keep.reshape(-1), mode="drop"
    )
    return obs_cam, obs_feat, obs_ok, n_over


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_problem(
    m: MapState, center_kf: jax.Array, cfg: EngineConfig
) -> BAProblem:
    """Gather the covisibility window + fixed observers + their observations."""
    K, F = m.kfs.obs_lm.shape
    L = m.lms.xyz.shape[0]
    W = cfg.max_local_kfs
    Wf = cfg.max_fixed_kfs
    C = W + Wf
    P = cfg.max_local_lms
    O = cfg.max_obs_per_lm

    # --- window cameras: center + best covisible --------------------------
    w_row = m.covis[center_kf]
    w_row = jnp.where(m.kfs.valid, w_row, 0).at[center_kf].set(jnp.int32(2**30))
    top_w, win_slots = jax.lax.top_k(w_row, W)
    win_ok = top_w > 0

    # --- landmarks observed by the window --------------------------------
    win_rows = m.kfs.obs_lm[win_slots]                     # [W, F]
    row_ok = win_ok[:, None] & m.kfs.feat_valid[win_slots]
    obs_ids = jnp.where(row_ok & (win_rows >= 0), win_rows, L)
    mark = jnp.zeros((L + 1,), jnp.int32).at[obs_ids.reshape(-1)].add(1)[:L]
    lm_sel = (mark > 0) & m.lms.valid
    lm_ids, = jnp.nonzero(lm_sel, size=P, fill_value=L)
    lm_ids = lm_ids.astype(jnp.int32)
    inv = jnp.full((L + 1,), P, jnp.int32).at[lm_ids].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )

    # --- fixed cameras: other keyframes observing selected landmarks ------
    sel_mask_obs = lm_sel[jnp.clip(m.kfs.obs_lm, 0, L - 1)] & (m.kfs.obs_lm >= 0)
    kf_touches = jnp.sum(
        (sel_mask_obs & m.kfs.feat_valid).astype(jnp.int32), axis=1
    )
    in_window = jnp.zeros((K,), bool).at[jnp.where(win_ok, win_slots, K)].set(
        True, mode="drop"
    )
    fixed_score = jnp.where(m.kfs.valid & ~in_window, kf_touches, 0)
    top_f, fix_slots = jax.lax.top_k(fixed_score, Wf)
    fix_ok = top_f > 0

    cam_slots = jnp.concatenate([win_slots, fix_slots]).astype(jnp.int32)
    cam_valid = jnp.concatenate([win_ok, fix_ok])
    # gauge: freeze fixed observers + the first two keyframes (scale anchor)
    cam_opt = jnp.concatenate([win_ok, jnp.zeros((Wf,), bool)])
    cam_opt = cam_opt & (cam_slots >= 2)
    cam_slots = jnp.where(cam_valid, cam_slots, K)

    # --- bucket observations per landmark ---------------------------------
    # rank-by-presence-cumsum instead of an argsort over [C*F] (XLA TPU
    # sorts are the most expensive op of the build): a feature's slot in
    # its landmark's observation list = how many EARLIER cameras observe
    # that landmark (a landmark is associated to at most one feature per
    # keyframe, so within-row order never matters)
    rows = m.kfs.obs_lm[jnp.clip(cam_slots, 0, K - 1)]     # [C, F]
    rows_ok = (
        cam_valid[:, None]
        & m.kfs.feat_valid[jnp.clip(cam_slots, 0, K - 1)]
        & (rows >= 0)
    )
    li = jnp.where(rows_ok, inv[jnp.clip(rows, 0, L - 1)], P)  # [C, F]
    li = dedupe_row_landmarks(li, P)
    obs_cam, obs_feat, obs_ok, _ = bucket_observations(li, P, O)

    uv_all = m.kfs.uv[jnp.clip(cam_slots, 0, K - 1)]       # [C, F, 2]
    oct_all = m.kfs.octave[jnp.clip(cam_slots, 0, K - 1)]
    safe_cam = jnp.clip(obs_cam, 0, C - 1)
    obs_uv = uv_all[safe_cam, obs_feat]                     # [P, O, 2]
    obs_oct = oct_all[safe_cam, obs_feat]
    if cfg.bf > 0:   # static: mono configs never pay the stereo gathers
        ur_all = m.kfs.u_right[jnp.clip(cam_slots, 0, K - 1)]
        obs_ur = jnp.where(obs_ok, ur_all[safe_cam, obs_feat], -1.0)
    else:
        obs_ur = None
    obs_w = cfg.scale_factor ** (-2.0 * obs_oct.astype(jnp.float32))
    obs_w = jnp.where(obs_ok, obs_w, 0.0)

    return BAProblem(
        cam_slots=cam_slots,
        cam_opt=cam_opt,
        R=m.kfs.R[jnp.clip(cam_slots, 0, K - 1)],
        t=m.kfs.t[jnp.clip(cam_slots, 0, K - 1)],
        lm_ids=lm_ids,
        xyz=m.lms.xyz[jnp.clip(lm_ids, 0, L - 1)],
        obs_cam=obs_cam,
        obs_uv=obs_uv,
        obs_w=obs_w,
        obs_ok=obs_ok,
        obs_feat=obs_feat,
        obs_ur=obs_ur,
    )


def _use_stereo(prob: BAProblem, cfg: EngineConfig) -> bool:
    """Static (trace-time) decision: does this problem carry stereo rows?"""
    return prob.obs_ur is not None and cfg.bf > 0


def _residuals(prob: BAProblem, R, t, xyz, fx, fy, cx, cy, bf: float = 0.0):
    """All-observation residuals/Jacobians: [P, O, D, ...] (D = 2 mono, 3 stereo).

    With ``bf > 0`` and ``prob.obs_ur`` present, observations whose
    ``obs_ur >= 0`` get the third (uR) residual row; mono observations have
    that row and its Jacobian zeroed (reference: g2o's mixed
    EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ graphs).
    """
    C = prob.cam_slots.shape[0]
    safe_cam = jnp.clip(prob.obs_cam, 0, C - 1)
    Ro = R[safe_cam]                                  # [P, O, 3, 3]
    to = t[safe_cam]
    X = jnp.broadcast_to(xyz[:, None, :], prob.obs_uv.shape[:2] + (3,))
    if prob.obs_ur is not None and bf > 0:
        uvr_hat, z, J_pose, J_point = geo.stereo_project_jacobians(
            Ro, to, X, fx, fy, cx, cy, bf
        )
        obs = jnp.concatenate(
            [prob.obs_uv, prob.obs_ur[..., None]], axis=-1
        )
        r = uvr_hat - obs
        has_ur = prob.obs_ur >= 0.0
        r = r.at[..., 2].set(jnp.where(has_ur, r[..., 2], 0.0))
        J_pose = J_pose.at[..., 2, :].set(
            jnp.where(has_ur[..., None], J_pose[..., 2, :], 0.0)
        )
        J_point = J_point.at[..., 2, :].set(
            jnp.where(has_ur[..., None], J_point[..., 2, :], 0.0)
        )
        ok = prob.obs_ok & (z > 1e-3)
        return r, J_pose, J_point, ok
    uv_hat, z, J_pose, J_point = geo.project_jacobians(
        Ro, to, X, fx, fy, cx, cy
    )
    r = uv_hat - prob.obs_uv
    ok = prob.obs_ok & (z > 1e-3)
    return r, J_pose, J_point, ok


def _delta2_of(prob: BAProblem, cfg: EngineConfig, chi2_th):
    """Per-observation Huber delta^2: chi2_stereo for 3-row edges.

    Reference: delta = sqrt(5.991) for mono edges, sqrt(7.815) for stereo
    ones in LocalBundleAdjustment / GlobalBundleAdjustemnt.
    """
    if _use_stereo(prob, cfg):
        return jnp.where(prob.obs_ur >= 0.0, cfg.chi2_stereo, chi2_th)
    return chi2_th


def _robust_weights(r, w_info, ok, delta2):
    chi2 = jnp.sum(r * r, -1) * w_info
    w_rob = huber_weight(chi2, delta2)
    w = jnp.where(ok, w_info * w_rob, 0.0)
    cost = jnp.sum(
        jnp.where(
            ok,
            jnp.where(
                chi2 <= delta2,
                chi2,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
            ),
            0.0,
        )
    )
    return w, cost, chi2


@functools.partial(jax.jit, static_argnames=("cfg", "iters", "use_kernel"))
def solve_ba(
    prob: BAProblem,
    cfg: EngineConfig,
    iters: int = 10,
    chi2_th: float = 5.991,
    lam0: float = 1e-4,
    use_kernel: bool | None = None,
):
    """Damped Schur-complement LM over the extracted problem.

    ``use_kernel`` selects the fused Pallas reduction (None = automatic:
    on when the Pallas path is enabled and the problem fits — see
    kernels/schur.available). Returns (R [C,3,3], t [C,3], xyz [P,3],
    final robust cost).
    """
    fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    C = prob.cam_slots.shape[0]
    P = prob.lm_ids.shape[0]
    use_stereo = _use_stereo(prob, cfg)
    bf = cfg.bf if use_stereo else 0.0
    delta2 = _delta2_of(prob, cfg, chi2_th)

    cam_opt6 = jnp.repeat(prob.cam_opt, 6)          # [6C]

    def cost_of(R, t, xyz):
        r, _, _, ok = _residuals(prob, R, t, xyz, fx, fy, cx, cy, bf)
        _, cost, _ = _robust_weights(r, prob.obs_w, ok, delta2)
        # cheirality penalty: an observation pushed behind its camera drops
        # out of the masked robust cost, which lets LM "improve" by moving
        # landmarks behind FROZEN cameras and thereby deleting the anchor
        # constraints (observed as 100m+ block drift in block-coordinate
        # BA). Each newly-violated observation costs a large constant, so
        # such steps are rejected.
        n_behind = jnp.sum((prob.obs_ok & ~ok).astype(jnp.float32))
        return cost + 1e3 * n_behind

    O_ = prob.obs_cam.shape[1]
    from ..kernels import schur as schur_kernel

    if use_kernel is None:
        use_kernel = schur_kernel.available(C, P, O_) and prob.lm_opt is None
    elif use_kernel and prob.lm_opt is not None:
        raise ValueError(
            "the fused Pallas Schur kernel has no frozen-landmark path; "
            "call solve_ba with use_kernel=False for lm_opt problems"
        )

    def _reduce_jnp(R, t, xyz, lam):
        """Reference einsum reduction (CPU path / kernel fallback)."""
        r, J_c, J_l, ok = _residuals(prob, R, t, xyz, fx, fy, cx, cy, bf)
        w, cost, _ = _robust_weights(r, prob.obs_w, ok, delta2)
        # freeze non-optimized cameras by zeroing their pose Jacobians
        J_c = jnp.where(prob.cam_opt[jnp.clip(prob.obs_cam, 0, C - 1)][..., None, None], J_c, 0.0)
        if prob.lm_opt is not None:
            # frozen landmarks: observations act as pose-only edges
            J_l = jnp.where(prob.lm_opt[:, None, None, None], J_l, 0.0)

        # landmark blocks
        Hll = jnp.einsum("poki,po,pokj->pij", J_l, w, J_l)       # [P,3,3]
        g_l = jnp.einsum("poki,po,pok->pi", J_l, w, r)           # [P,3]
        dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
        Hll_d = Hll + (lam * jnp.maximum(dll, 1e-9) + 1e-9)[..., None] * jnp.eye(
            3, dtype=Hll.dtype
        )
        # factor the DAMPED block (PD by construction): Hll_d = Ld Ld^T,
        # Hll_inv = Ld^-T Ld^-1.  The adjugate inverse is cheaper but its
        # clamped determinant yields a non-PD "inverse" for near-singular
        # blocks, whose Cholesky split below then blows S_red past f32 range
        Ld = chol3x3(Hll_d)
        Ld_inv = tri_inv3x3_lower(Ld)
        Hll_inv = jnp.einsum("pki,pkj->pij", Ld_inv, Ld_inv)

        # camera-side reductions as one-hot matmuls (MXU): observations
        # scatter into cameras via a [P, O, C+1] selection tensor — all
        # reductions become contractions, which is what the TPU is fast at
        # (serialized scatter-adds were the dominant device cost of a
        # keyframe). The Schur pair term uses the Cholesky split
        # Hll^-1 = Lh Lh^T:  S_pair = Z Z^T with Z = sum_o E (Y Lh).
        Hcc_blk = jnp.einsum("poki,po,pokj->poij", J_c, w, J_c)  # [P,O,6,6]
        g_c_blk = jnp.einsum("poki,po,pok->poi", J_c, w, r)      # [P,O,6]
        Y = jnp.einsum("poki,po,pokj->poij", J_c, w, J_l)        # [P,O,6,3]
        YHinv = jnp.einsum("poij,pjk->poik", Y, Hll_inv)         # [P,O,6,3]
        gt_blk = jnp.einsum("poij,pj->poi", YHinv, g_l)          # [P,O,6]

        cam_c = jnp.clip(prob.obs_cam, 0, C)
        Lh = jnp.swapaxes(Ld_inv, -1, -2)                        # [P,3,3]
        YL = jnp.einsum("poij,pjk->poik", Y, Lh)                 # [P,O,6,3]

        # landmark chunking keeps the [Pc, C+1, 6, 3] Z tensor bounded at
        # global-BA capacities; pick the largest chunk within budget that
        # divides P evenly
        budget = 96 * 1024 * 1024
        pc_target = max(1, budget // max((C + 1) * 18 * 4, 1))
        Pc = P
        while Pc > pc_target and Pc % 2 == 0:
            Pc //= 2
        n_ch = P // Pc

        def chunk_terms(args):
            camc, okc, hccb, gcb, gtb, yl = args
            E = jax.nn.one_hot(camc, C + 1, dtype=jnp.float32) * okc[..., None]
            Hcc_c = jnp.einsum("poc,poij->cij", E, hccb)
            g_c_c = jnp.einsum("poc,poi->ci", E, gcb)
            g_red_c = jnp.einsum("poc,poi->ci", E, gtb)
            Zc = jnp.einsum("poc,poik->pcik", E, yl)
            # S = Z Z^T as one big matmul: contraction over (p, k) with the
            # camera-block axis flattened — [6(C+1), 3 Pc] @ [3 Pc, 6(C+1)]
            # is an MXU-shaped contraction (the naive einsum contracts over
            # k=3 only, which starves the systolic array)
            pc = Zc.shape[0]
            Zr = jnp.transpose(Zc, (1, 2, 0, 3)).reshape(
                (C + 1) * 6, pc * 3
            )
            S_flat = jnp.dot(Zr, Zr.T, preferred_element_type=jnp.float32)
            S_c = S_flat.reshape(C + 1, 6, C + 1, 6)   # [c, i, d, j] layout
            return Hcc_c, g_c_c, g_red_c, S_c

        if n_ch == 1:
            Hcc_f, g_c_f, g_red_f, S_f = chunk_terms(
                (cam_c, ok, Hcc_blk, g_c_blk, gt_blk, YL)
            )
        else:
            def resh(x):
                return x.reshape((n_ch, Pc) + x.shape[1:])

            def scan_body(carry, args):
                h, gc_, gr, s = carry
                hc, gcc, grc, sc = chunk_terms(args)
                return (h + hc, gc_ + gcc, gr + grc, s + sc), None

            init = (
                jnp.zeros((C + 1, 6, 6)), jnp.zeros((C + 1, 6)),
                jnp.zeros((C + 1, 6)), jnp.zeros((C + 1, 6, C + 1, 6)),
            )
            (Hcc_f, g_c_f, g_red_f, S_f), _ = jax.lax.scan(
                scan_body, init,
                (resh(cam_c), resh(ok), resh(Hcc_blk), resh(g_c_blk),
                 resh(gt_blk), resh(YL)),
            )
        S_pair = S_f[:C, :, :C, :]                       # [c, i, d, j]
        return Hll_inv, g_l, Y, Hcc_f[:C], g_c_f[:C], g_red_f[:C], S_pair

    def step(R, t, xyz, lam):
        if use_kernel:
            # fused Pallas reduction (kernels/schur.py): same damping and
            # robust-weight math, no [P,O,...] HBM intermediates; carries
            # the stereo (uR) third row when the problem has one
            Hll_inv, g_l, Y, Hcc, g_c, g_red, S_pair = schur_kernel.schur_reduce(
                R, t, prob.cam_opt, xyz, prob.obs_cam, prob.obs_uv,
                prob.obs_w, lam, fx, fy, cx, cy, delta2=chi2_th,
                obs_ur=prob.obs_ur if use_stereo else None,
                bf=bf, delta2_stereo=cfg.chi2_stereo,
            )
            cost = jnp.float32(0.0)   # unused: the LM loop re-evaluates cost
        else:
            Hll_inv, g_l, Y, Hcc, g_c, g_red, S_pair = _reduce_jnp(
                R, t, xyz, lam
            )
            cost = jnp.float32(0.0)

        # assemble dense reduced system [6C, 6C]
        dcc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)              # [C, 6]
        Hcc_d = Hcc + (lam * jnp.maximum(dcc, 1e-9) + 1e-9)[..., None] * jnp.eye(
            6, dtype=Hcc.dtype
        )
        S = (
            jnp.zeros((C, 6, C, 6))
            .at[jnp.arange(C), :, jnp.arange(C), :]
            .set(Hcc_d)
        )
        S = S - S_pair
        S = S.reshape(6 * C, 6 * C)
        rhs = -(g_c - g_red).reshape(-1)

        # freeze: identity rows/cols for non-optimized cams
        S = jnp.where(cam_opt6[:, None] & cam_opt6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(cam_opt6, 0.0, 1.0))
        rhs = jnp.where(cam_opt6, rhs, 0.0)

        dc = jnp.linalg.solve(S, rhs).reshape(C, 6)

        # back-substitute landmarks: dl = Hll^-1 (-g_l - sum_o Y_o^T dc_{c_o})
        # (Y is exactly zero for invalid observations, so no extra mask)
        dc_per_obs = dc[jnp.clip(prob.obs_cam, 0, C - 1)]        # [P,O,6]
        cross = jnp.einsum("poij,poi->pj", Y, dc_per_obs)        # [P,3]
        dl = jnp.einsum("pij,pj->pi", Hll_inv, -g_l - cross)

        # apply
        R_new, t_new = geo.se3_retract(R, t, dc)
        xyz_new = xyz + dl
        return R_new, t_new, xyz_new, cost

    def body(_, carry):
        R, t, xyz, lam, cost = carry
        R_new, t_new, xyz_new, _ = step(R, t, xyz, lam)
        new_cost = cost_of(R_new, t_new, xyz_new)
        # non-finite params mask their residuals out of the robust cost, so
        # a NaN step can look like an improvement — reject it explicitly
        accept = (new_cost < cost) & all_finite((R_new, t_new, xyz_new))
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        xyz = jnp.where(accept, xyz_new, xyz)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return R, t, xyz, lam, cost

    R_in = geo.orthogonalize(prob.R)
    cost0 = cost_of(R_in, prob.t, prob.xyz)
    R, t, xyz, _, cost = jax.lax.fori_loop(
        0, iters, body, (R_in, prob.t, prob.xyz, jnp.float32(lam0), cost0)
    )
    return geo.orthogonalize(R), t, xyz, cost


@functools.partial(jax.jit, static_argnames=("cfg",))
def write_back(
    m: MapState,
    prob: BAProblem,
    R: jax.Array,
    t: jax.Array,
    xyz: jax.Array,
    cfg: EngineConfig,
    chi2_th: float = 5.991,
) -> MapState:
    """Write optimized poses/points into the map and strip outlier obs.

    Reference: the post-BA outlier erase under the map mutex.
    """
    K = m.kfs.valid.shape[0]
    L = m.lms.xyz.shape[0]
    C = prob.cam_slots.shape[0]
    # poses (optimized cameras only)
    tgt = jnp.where(prob.cam_opt, prob.cam_slots, K)
    kfs = m.kfs._replace(
        R=m.kfs.R.at[tgt].set(R, mode="drop"),
        t=m.kfs.t.at[tgt].set(t, mode="drop"),
    )
    # landmarks
    lm_tgt = jnp.where(prob.lm_ids < L, prob.lm_ids, L)
    lms = m.lms._replace(xyz=m.lms.xyz.at[lm_tgt].set(xyz, mode="drop"))

    # outlier observations at the optimized state (stereo edges classify
    # against chi2_stereo, as the reference's post-BA erase does)
    bf = cfg.bf if _use_stereo(prob, cfg) else 0.0
    r, _, _, ok = _residuals(
        prob, R, t, xyz, cfg.fx, cfg.fy, cfg.cx, cfg.cy, bf
    )
    chi2 = jnp.sum(r * r, -1) * prob.obs_w
    bad = ok & (chi2 > _delta2_of(prob, cfg, chi2_th))
    cam_slot_of_obs = prob.cam_slots[jnp.clip(prob.obs_cam, 0, C - 1)]
    k_idx = jnp.where(bad, cam_slot_of_obs, K).reshape(-1)
    f_idx = prob.obs_feat.reshape(-1)
    obs_lm = kfs.obs_lm.at[k_idx, f_idx].set(INVALID_ID, mode="drop")
    kfs = kfs._replace(obs_lm=obs_lm)
    return m._replace(kfs=kfs, lms=lms)


def local_bundle_adjustment(
    m: MapState, center_kf, cfg: EngineConfig, iters: int = 10
) -> MapState:
    """Full local BA pass: extract window -> solve -> write back."""
    prob = build_problem(m, jnp.int32(center_kf), cfg)
    R, t, xyz, _ = solve_ba(prob, cfg, iters=iters, chi2_th=cfg.chi2_mono)
    return write_back(m, prob, R, t, xyz, cfg, chi2_th=cfg.chi2_mono)
