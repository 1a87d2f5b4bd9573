"""Per-frame tracking: device-side steps of the Track() state machine.

Replaces the reference's tracking thread logic (canonical
``src/Tracking.cc`` — SURVEY.md §2.1/§3.2). The host keeps only the scalar
state machine (``system.Engine``); each arrow of the reference's Track()
flow is one jitted device function here (SURVEY.md §7.1 rule 7):

* ``track_motion_model``   — TrackWithMotionModel's projection search
* ``match_reference_kf``   — TrackReferenceKeyFrame's descriptor match
* ``local_landmark_ids``   — UpdateLocalMap's covisible point set
* ``track_local_map_match``— SearchLocalPoints projection match + merge

Pose optimization itself lives in ``optim.pose_only``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrackOut(NamedTuple):
    R: jax.Array
    t: jax.Array

from . import geometry as geo
from . import matching
from .config import EngineConfig
from .containers import FrameArrays, MapState, INVALID_ID


def predict_scale(dist: jax.Array, dmax: jax.Array, cfg: EngineConfig) -> jax.Array:
    """Predicted detection octave from camera distance (MapPoint::PredictScale)."""
    ratio = jnp.maximum(dmax / jnp.maximum(dist, 1e-6), 1e-6)
    # small epsilon so ratio == 1.0 maps to level 0 despite float noise
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(cfg.scale_factor) - 1e-4)
    return jnp.clip(lvl, 0, cfg.n_levels - 1).astype(jnp.int32)


def _project_landmarks(
    m: MapState, ids: jax.Array, R, t, cfg: EngineConfig, frustum: bool = False
):
    """Gather landmark data for ids (L = invalid sentinel) and project.

    With ``frustum=True`` the full Frame::isInFrustum gate applies: besides
    in-image + positive depth, the viewing direction must be within 60 deg of
    the landmark's mean normal and the camera distance inside the
    scale-invariance band [0.8*dmin, 1.2*dmax] (reference: Frame.cc
    isInFrustum; used by SearchLocalPoints and Fuse, NOT by the
    last-frame motion-model search).

    Returns (xyz, desc, uv, octave, vis) all sized like ids.
    """
    L = m.lms.xyz.shape[0]
    safe = jnp.clip(ids, 0, L - 1)
    ok = (ids >= 0) & (ids < L) & m.lms.valid[safe]
    xyz = m.lms.xyz[safe]
    desc = m.lms.desc[safe]
    dmax = m.lms.dmax[safe]
    uv, z = geo.project(R, t, xyz, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    inb = (
        (uv[:, 0] >= 0)
        & (uv[:, 0] < cfg.width)
        & (uv[:, 1] >= 0)
        & (uv[:, 1] < cfg.height)
    )
    cam_center = -R.T @ t
    ray = xyz - cam_center
    dist = jnp.linalg.norm(ray, axis=-1)
    octv = predict_scale(dist, dmax, cfg)
    vis = ok & (z > 1e-3) & inb
    if frustum:
        normal = m.lms.normal[safe]
        dmin = m.lms.dmin[safe]
        cos_view = jnp.sum(ray * normal, axis=-1) / jnp.maximum(dist, 1e-9)
        vis = (
            vis
            & (cos_view > cfg.view_cos_th)
            & (dist >= 0.8 * dmin)
            & (dist <= 1.2 * dmax)
        )
    return xyz, desc, uv, octv, vis


@functools.partial(jax.jit, static_argnames=("cfg", "radius"))
def track_motion_model(
    m: MapState,
    last_lm_ids: jax.Array,   # i32[F] landmark of each last-frame feature
    frame: FrameArrays,
    R_pred: jax.Array,
    t_pred: jax.Array,
    cfg: EngineConfig,
    radius: float = 15.0,
):
    """Project last frame's landmarks into the predicted pose and match.

    Returns (lm_of_feat i32[F] (-1 = none), n_matches i32).
    """
    F = frame.uv.shape[0]
    L = m.lms.xyz.shape[0]
    ids = jnp.where(last_lm_ids >= 0, last_lm_ids, L)
    _, desc, uv_pred, octv, vis = _project_landmarks(m, ids, R_pred, t_pred, cfg)
    match_ft, _ = matching.match_projected(
        desc, uv_pred, vis, octv,
        frame.desc, frame.uv, frame.valid, frame.octave,
        radius=radius, scale_factor=cfg.scale_factor,
        max_dist=cfg.th_high, ratio=0.9,
    )
    # invert: per-feature landmark
    lm_of_feat = jnp.full((F,), INVALID_ID, jnp.int32)
    src = jnp.where(match_ft >= 0, ids, L)
    lm_of_feat = lm_of_feat.at[jnp.where(match_ft >= 0, match_ft, F)].set(
        src.astype(jnp.int32), mode="drop"
    )
    lm_of_feat = jnp.where(lm_of_feat >= L, INVALID_ID, lm_of_feat)
    return lm_of_feat, jnp.sum((lm_of_feat >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_reference_kf(
    m: MapState,
    ref_kf: jax.Array,
    frame: FrameArrays,
    cfg: EngineConfig,
):
    """Descriptor-only match against a keyframe's landmarks (reference:
    TrackReferenceKeyFrame via SearchByBoW; BoW bucketing is unnecessary at
    TPU matrix sizes). Returns (lm_of_feat i32[F], n_matches)."""
    F = frame.uv.shape[0]
    L = m.lms.xyz.shape[0]
    kf_desc = m.kfs.desc[ref_kf]
    kf_obs = m.kfs.obs_lm[ref_kf]
    kf_ok = (
        m.kfs.feat_valid[ref_kf]
        & (kf_obs >= 0)
        & m.lms.valid[jnp.clip(kf_obs, 0, L - 1)]
    )
    dist = matching.hamming_distance_matrix(kf_desc, frame.desc)
    match_ft, _ = matching.match_mutual(
        dist, kf_ok, frame.valid, max_dist=cfg.th_low, ratio=0.75
    )
    ok = match_ft >= 0
    ok = matching.rotation_consistency_mask(
        m.kfs.angle[ref_kf], frame.angle, match_ft, ok
    )
    lm_of_feat = jnp.full((F,), INVALID_ID, jnp.int32)
    lm_of_feat = lm_of_feat.at[jnp.where(ok, match_ft, F)].set(
        jnp.where(ok, kf_obs, L).astype(jnp.int32), mode="drop"
    )
    lm_of_feat = jnp.where(lm_of_feat >= L, INVALID_ID, lm_of_feat)
    return lm_of_feat, jnp.sum((lm_of_feat >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def local_landmark_ids(m: MapState, ref_kf: jax.Array, cfg: EngineConfig):
    """Landmarks seen by the reference KF's covisibility neighborhood.

    Reference: Tracking::UpdateLocalMap (K1 covisible keyframes' points).
    Returns i32[max_local_lms] compacted ids (L = fill sentinel).
    """
    K, F = m.kfs.obs_lm.shape
    L = m.lms.xyz.shape[0]
    neigh = (m.covis[ref_kf] > 0) & m.kfs.valid
    neigh = neigh.at[ref_kf].set(True)
    obs = m.kfs.obs_lm
    sel = neigh[:, None] & m.kfs.feat_valid & (obs >= 0)
    flat = jnp.where(sel, obs, L).reshape(-1)
    mark = jnp.zeros((L + 1,), jnp.int32).at[flat].add(1)[:L]
    mark = (mark > 0) & m.lms.valid
    ids, = jnp.nonzero(mark, size=cfg.max_local_lms, fill_value=L)
    return ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "radius"))
def track_local_map_match(
    m: MapState,
    local_ids: jax.Array,     # i32[max_local_lms]
    frame: FrameArrays,
    lm_of_feat: jax.Array,    # i32[F] existing associations (kept)
    R: jax.Array,
    t: jax.Array,
    cfg: EngineConfig,
    radius: float = 6.0,
):
    """Project the local map and match unassociated features (reference:
    SearchLocalPoints, with the full isInFrustum gate). Existing
    associations win over new candidates.
    Returns (lm_of_feat i32[F], n_matches, in_frustum bool[max_local_lms]);
    the last output feeds the landmark n_visible counters (reference:
    MapPoint::IncreaseVisible)."""
    F = frame.uv.shape[0]
    L = m.lms.xyz.shape[0]
    # exclude landmarks already matched in this frame
    already = jnp.zeros((L + 1,), bool).at[
        jnp.where(lm_of_feat >= 0, lm_of_feat, L)
    ].set(True)[:L]
    _, desc, uv_pred, octv, in_frustum = _project_landmarks(
        m, local_ids, R, t, cfg, frustum=True
    )
    safe = jnp.clip(local_ids, 0, L - 1)
    vis = in_frustum & ~already[safe]
    feat_free = frame.valid & (lm_of_feat < 0)
    match_ft, _ = matching.match_projected(
        desc, uv_pred, vis, octv,
        frame.desc, frame.uv, feat_free, frame.octave,
        radius=radius, scale_factor=cfg.scale_factor,
        max_dist=cfg.th_high, ratio=0.8, octave_band=2,
    )
    new_lm = jnp.full((F,), INVALID_ID, jnp.int32)
    src = jnp.where(match_ft >= 0, safe, L)
    new_lm = new_lm.at[jnp.where(match_ft >= 0, match_ft, F)].set(
        src.astype(jnp.int32), mode="drop"
    )
    new_lm = jnp.where(new_lm >= L, INVALID_ID, new_lm)
    merged = jnp.where(lm_of_feat >= 0, lm_of_feat, new_lm)
    # already-associated local landmarks count as visible too (reference:
    # IncreaseVisible also fires for points matched by the motion model)
    in_frustum = in_frustum | already[safe]
    return merged, jnp.sum((merged >= 0).astype(jnp.int32)), in_frustum


@functools.partial(jax.jit, static_argnames=("cfg", "use_stereo"))
def fused_track_step_auto(
    m: MapState,
    last_lm_ids: jax.Array,
    frame: FrameArrays,
    R_last: jax.Array,
    t_last: jax.Array,
    R_prev: jax.Array,
    t_prev: jax.Array,
    has_vel: jax.Array,
    ref_kf: jax.Array,
    cfg: EngineConfig,
    use_stereo: bool = False,
):
    """`fused_track_step` with the constant-velocity prediction computed on
    device from the two previous poses — lets the host chain frames without
    ever syncing pose values (the pipelined tracking mode)."""
    return _auto_step(
        m, last_lm_ids, frame, R_last, t_last, R_prev, t_prev, has_vel,
        ref_kf, cfg, use_stereo,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "use_stereo"))
def fused_track_multi(
    m: MapState,
    lm_ids0: jax.Array,
    frames: FrameArrays,        # leading batch dim B on every leaf
    R0: jax.Array,
    t0: jax.Array,
    R_prev0: jax.Array,
    t_prev0: jax.Array,
    has_vel0: jax.Array,
    ref_kf: jax.Array,
    cfg: EngineConfig,
    use_stereo: bool = False,
):
    """Track B consecutive frames in ONE dispatch (lax.scan over frames).

    The per-dispatch tunnel overhead is the throughput bottleneck; batching
    B frames amortizes it B-fold. The map is frozen for the batch — mapping
    lags tracking by up to B + pipeline-depth frames, the same kind of lag
    the reference's asynchronous LocalMapping exhibits.

    Returns (R_last, t_last, R_prev, t_prev, lm_ids_last, packed [B, 26],
    (vis_inc, found_inc) i32[L] batch-summed visibility counters).
    """

    L = m.lms.xyz.shape[0]
    # the local candidate set depends only on (map, ref_kf), both frozen for
    # the whole batch — hoist its [K,F]-scatter + nonzero out of the scan
    # instead of trusting XLA to move loop-invariant scatters
    local_ids = local_landmark_ids(m, ref_kf, cfg)

    def body(carry, frame):
        lm_ids, R, t, Rp, tp, hv, vis_acc, found_acc = carry
        R2, t2, lm2, packed, (vis_inc, found_inc) = _auto_step(
            m, lm_ids, frame, R, t, Rp, tp, hv, ref_kf, cfg, use_stereo,
            local_ids=local_ids,
        )
        return (
            lm2, R2, t2, R, t, jnp.asarray(True),
            vis_acc + vis_inc, found_acc + found_inc,
        ), packed

    zero = jnp.zeros((L,), jnp.int32)
    init = (lm_ids0, R0, t0, R_prev0, t_prev0, has_vel0, zero, zero)
    (lm_l, R_l, t_l, R_p, t_p, _, vis_acc, found_acc), packed = jax.lax.scan(
        body, init, frames
    )
    return R_l, t_l, R_p, t_p, lm_l, packed, (vis_acc, found_acc)


def _auto_step(m, lm_ids, frame, R, t, Rp, tp, hv, ref_kf, cfg, use_stereo,
               local_ids=None):
    """Un-jitted body shared by fused_track_step_auto and fused_track_multi."""
    Rv = geo.orthogonalize(R @ jnp.swapaxes(Rp, -1, -2))
    tv = t - Rv @ tp
    R_pred = jnp.where(hv, Rv @ R, R)
    t_pred = jnp.where(hv, Rv @ t + tv, t)
    return fused_track_step(
        m, lm_ids, frame, R_pred, t_pred, R, t, ref_kf, cfg,
        use_stereo=use_stereo, local_ids=local_ids,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "use_stereo"))
def fused_track_step(
    m: MapState,
    last_lm_ids: jax.Array,
    frame: FrameArrays,
    R_pred: jax.Array,
    t_pred: jax.Array,
    R_last: jax.Array,
    t_last: jax.Array,
    ref_kf: jax.Array,
    cfg: EngineConfig,
    use_stereo: bool = False,
    local_ids: jax.Array | None = None,
):
    """The whole per-frame tracking pipeline in ONE device dispatch.

    Motion-model search (normal + wide radius), reference-KF fallback, pose
    optimization, local-map search, second pose optimization, and outlier
    filtering — the reference's Track() data path minus the host decisions.
    All three match strategies are computed unconditionally and selected on
    device (they are cheap VPU matrix work; a host round-trip is not).

    Returns (R, t, lm_ids, packed, (vis_inc, found_inc)): `packed` is the
    single f32[26] array the host pulls per frame; the i32[L] count
    increments feed MapPoint visibility accounting via apply_track_counts.
    """
    from .optim import pose_optimization

    chi2 = cfg.chi2_stereo if use_stereo else cfg.chi2_mono

    lm_a, n_a = _motion_match(
        m, last_lm_ids, frame, R_pred, t_pred, cfg, cfg.motion_search_radius
    )

    def happy(_):
        return lm_a, n_a, R_pred, t_pred

    def fallback(_):
        # wider projection search, then reference-KF descriptor match; the
        # lax.cond means the common case never pays for these (TPU executes
        # only the taken branch)
        lm_b, n_b = _motion_match(
            m, last_lm_ids, frame, R_pred, t_pred, cfg,
            2.0 * cfg.motion_search_radius,
        )
        lm_c, n_c = _ref_kf_match(m, ref_kf, frame, cfg)
        use_b = n_b >= 20
        lm = jnp.where(use_b, lm_b, lm_c)
        n = jnp.where(use_b, n_b, n_c)
        # the reference-KF fallback restarts from the last pose
        R0f = jnp.where(use_b, R_pred, R_last)
        t0f = jnp.where(use_b, t_pred, t_last)
        return lm, n, R0f, t0f

    lm_ids, n_mm, R0, t0 = jax.lax.cond(n_a >= 20, happy, fallback, None)

    X, uv, inv_s2, valid = gather_track_problem(m, frame, lm_ids, cfg)
    res = pose_optimization(
        R0, t0, X, uv, inv_s2, valid,
        cfg.fx, cfg.fy, cfg.cx, cfg.cy, chi2_th=chi2,
        rounds=cfg.pose_opt_rounds, iters=cfg.pose_opt_iters,
        u_right=frame.u_right, bf=cfg.bf, use_stereo=use_stereo,
    )
    lm_ids = jnp.where(res.inlier, lm_ids, INVALID_ID)

    if local_ids is None:
        local_ids = local_landmark_ids(m, ref_kf, cfg)
    lm_ids, _, in_frustum = track_local_map_match(
        m, local_ids, frame, lm_ids, res.R, res.t, cfg
    )
    X, uv, inv_s2, valid = gather_track_problem(m, frame, lm_ids, cfg)
    res2 = pose_optimization(
        res.R, res.t, X, uv, inv_s2, valid,
        cfg.fx, cfg.fy, cfg.cx, cfg.cy, chi2_th=chi2,
        rounds=2, iters=cfg.pose_opt_iters,
        u_right=frame.u_right, bf=cfg.bf, use_stereo=use_stereo,
    )
    lm_ids, n_tracked = filter_outlier_assoc(
        res2.R, res2.t, m, frame, lm_ids, cfg, chi2_th=chi2
    )
    # per-landmark visibility/found increments for MapPointCulling's
    # found-ratio rule (reference: Tracking::TrackLocalMap's
    # IncreaseVisible on frustum-passing local points + IncreaseFound on
    # final inlier associations)
    L = m.lms.xyz.shape[0]
    vis_inc = (
        jnp.zeros((L + 1,), jnp.int32)
        .at[jnp.where(in_frustum, local_ids, L)]
        .add(1, mode="drop")[:L]
    )
    found_inc = (
        jnp.zeros((L + 1,), jnp.int32)
        .at[jnp.where(lm_ids >= 0, lm_ids, L)]
        .add(1, mode="drop")[:L]
    )
    # found implies visible even when the landmark came from the motion
    # model rather than the local candidate set
    vis_inc = jnp.maximum(vis_inc, found_inc)
    counts = (vis_inc, found_inc)
    # pack everything the host needs into ONE array -> one D2H transfer
    # (the tunnel's per-transfer latency dominates frame time): R (9),
    # t (3), R_rel to ref KF (9), t_rel (3), n_tracked, n_mm.
    R_ref, t_ref = m.kfs.R[ref_kf], m.kfs.t[ref_kf]
    R_rel = res2.R @ R_ref.T
    t_rel = res2.t - R_rel @ t_ref
    packed = jnp.concatenate(
        [
            res2.R.reshape(9),
            res2.t,
            R_rel.reshape(9),
            t_rel,
            jnp.stack([n_tracked.astype(jnp.float32), n_mm.astype(jnp.float32)]),
        ]
    )
    return res2.R, res2.t, lm_ids, packed, counts


def _motion_match(m, last_lm_ids, frame, R_pred, t_pred, cfg, radius):
    """Non-jitted inner version of track_motion_model (inlined in the fused
    step; radius is a traced value here, so the gate uses it dynamically)."""
    F = frame.uv.shape[0]
    L = m.lms.xyz.shape[0]
    ids = jnp.where(last_lm_ids >= 0, last_lm_ids, L)
    _, desc, uv_pred, octv, vis = _project_landmarks(m, ids, R_pred, t_pred, cfg)
    match_ft, _ = matching.match_projected(
        desc, uv_pred, vis, octv,
        frame.desc, frame.uv, frame.valid, frame.octave,
        radius=radius, scale_factor=cfg.scale_factor,
        max_dist=cfg.th_high, ratio=0.9,
    )
    lm_of_feat = jnp.full((F,), INVALID_ID, jnp.int32)
    src = jnp.where(match_ft >= 0, ids, L)
    lm_of_feat = lm_of_feat.at[jnp.where(match_ft >= 0, match_ft, F)].set(
        src.astype(jnp.int32), mode="drop"
    )
    lm_of_feat = jnp.where(lm_of_feat >= L, INVALID_ID, lm_of_feat)
    return lm_of_feat, jnp.sum((lm_of_feat >= 0).astype(jnp.int32))


def _ref_kf_match(m, ref_kf, frame, cfg):
    F = frame.uv.shape[0]
    L = m.lms.xyz.shape[0]
    kf_desc = m.kfs.desc[ref_kf]
    kf_obs = m.kfs.obs_lm[ref_kf]
    kf_ok = (
        m.kfs.feat_valid[ref_kf]
        & (kf_obs >= 0)
        & m.lms.valid[jnp.clip(kf_obs, 0, L - 1)]
    )
    dist = matching.hamming_distance_matrix(kf_desc, frame.desc)
    match_ft, _ = matching.match_mutual(
        dist, kf_ok, frame.valid, max_dist=cfg.th_low, ratio=0.75
    )
    ok = match_ft >= 0
    ok = matching.rotation_consistency_mask(
        m.kfs.angle[ref_kf], frame.angle, match_ft, ok
    )
    lm_of_feat = jnp.full((F,), INVALID_ID, jnp.int32)
    lm_of_feat = lm_of_feat.at[jnp.where(ok, match_ft, F)].set(
        jnp.where(ok, kf_obs, L).astype(jnp.int32), mode="drop"
    )
    lm_of_feat = jnp.where(lm_of_feat >= L, INVALID_ID, lm_of_feat)
    return lm_of_feat, jnp.sum((lm_of_feat >= 0).astype(jnp.int32))


@jax.jit
def apply_track_counts(m: MapState, counts) -> MapState:
    """Fold per-frame (or batch-summed) visibility/found increments into the
    landmark store (reference: MapPoint::IncreaseVisible/IncreaseFound).
    A tiny device-side add — dispatched asynchronously, never synced."""
    vis_inc, found_inc = counts
    lms = m.lms._replace(
        n_visible=m.lms.n_visible + vis_inc,
        n_found=m.lms.n_found + found_inc,
    )
    return m._replace(lms=lms)


@functools.partial(jax.jit, static_argnames=("cfg",))
def gather_track_problem(
    m: MapState,
    frame: FrameArrays,
    lm_of_feat: jax.Array,
    cfg: EngineConfig,
):
    """Build the (X, uv, inv_sigma2, valid) arrays for pose optimization."""
    L = m.lms.xyz.shape[0]
    safe = jnp.clip(lm_of_feat, 0, L - 1)
    valid = (lm_of_feat >= 0) & frame.valid & m.lms.valid[safe]
    X = m.lms.xyz[safe]
    inv_sigma2 = cfg.scale_factor ** (-2.0 * frame.octave.astype(jnp.float32))
    return X, frame.uv, inv_sigma2, valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def filter_outlier_assoc(
    R: jax.Array,
    t: jax.Array,
    m: MapState,
    frame: FrameArrays,
    lm_of_feat: jax.Array,
    cfg: EngineConfig,
    chi2_th: float = 5.991,
):
    """Drop associations failing the chi2 gate at the final pose."""
    X, uv, inv_s2, valid = gather_track_problem(m, frame, lm_of_feat, cfg)
    uv_hat, z = geo.project(R, t, X, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    chi2 = jnp.sum((uv_hat - uv) ** 2, -1) * inv_s2
    ok = valid & (z > 1e-3) & (chi2 <= chi2_th)
    out = jnp.where(ok, lm_of_feat, INVALID_ID)
    return out, jnp.sum(ok.astype(jnp.int32))
