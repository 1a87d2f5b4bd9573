"""Keyframe insertion and map growth (device-side, mask-based).

Replaces the reference's local-mapping thread (canonical
``src/LocalMapping.cc`` — SURVEY.md §2.1/§3.3): keyframe processing,
landmark association, epipolar triangulation of new points, and culling.
There is no thread and no queue — each step is a pure jitted
``MapState -> MapState`` function invoked synchronously per keyframe
(SURVEY.md §7.1 rule 1); pipeline overlap comes from JAX async dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import matching
from .config import EngineConfig
from .containers import (
    INVALID_ID,
    FrameArrays,
    MapState,
    recount_lm_obs,
    update_covis_for_kf,
)


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_keyframe(
    m: MapState,
    frame: FrameArrays,
    R: jax.Array,
    t: jax.Array,
    lm_ids: jax.Array,     # i32[F] landmark id per feature (-1 = none)
    frame_id: jax.Array,
    timestamp: jax.Array,
    slot: jax.Array,       # i32 scalar: keyframe slot to write
    parent: jax.Array,     # i32 scalar: spanning-tree parent (-1 root)
    cfg: EngineConfig,
) -> MapState:
    """Write a frame into keyframe slot and refresh covisibility + obs counts.

    Reference: Tracking::CreateNewKeyFrame + LocalMapping::ProcessNewKeyFrame.
    """
    kfs = m.kfs
    lm_ids = jnp.where(frame.valid, lm_ids, INVALID_ID)
    kfs = kfs._replace(
        R=kfs.R.at[slot].set(R),
        t=kfs.t.at[slot].set(t),
        uv=kfs.uv.at[slot].set(frame.uv),
        desc=kfs.desc.at[slot].set(frame.desc),
        octave=kfs.octave.at[slot].set(frame.octave),
        angle=kfs.angle.at[slot].set(frame.angle),
        u_right=kfs.u_right.at[slot].set(frame.u_right),
        depth=kfs.depth.at[slot].set(frame.depth),
        feat_valid=kfs.feat_valid.at[slot].set(frame.valid),
        obs_lm=kfs.obs_lm.at[slot].set(lm_ids),
        valid=kfs.valid.at[slot].set(True),
        frame_id=kfs.frame_id.at[slot].set(frame_id),
        timestamp=kfs.timestamp.at[slot].set(timestamp),
        parent=kfs.parent.at[slot].set(parent),
        # monotonic insertion number: slot indices stop being age-ordered
        # once culling frees slots for reuse, so recency tests key on seq
        seq=kfs.seq.at[slot].set(jnp.max(kfs.seq) + 1),
        # a recycled slot must not inherit the previous tenant's cull record
        cull_parent=kfs.cull_parent.at[slot].set(INVALID_ID),
        cull_seq=kfs.cull_seq.at[slot].set(INVALID_ID),
    )
    m = m._replace(kfs=kfs, num_kfs=jnp.maximum(m.num_kfs, slot + 1))
    # refresh per-landmark observation counts for this KF's associations
    L = m.lms.xyz.shape[0]
    obs = jnp.where(lm_ids >= 0, lm_ids, L)
    add = jnp.zeros((L + 1,), jnp.int32).at[obs].add(1)[:L]
    m = m._replace(lms=m.lms._replace(n_obs=m.lms.n_obs + add))
    return update_covis_for_kf(m, slot)


def alloc_landmarks(
    m: MapState,
    X: jax.Array,         # f32[N, 3] world points
    desc: jax.Array,      # u32[N, 8]
    octave: jax.Array,    # i32[N] octave of the creating observation
    mask: jax.Array,      # bool[N] which candidates to allocate
    ref_kf: jax.Array,    # i32 scalar creating keyframe
    cam_center: jax.Array,  # f32[3] creating camera center (world)
    cfg: EngineConfig,
):
    """Pack masked candidates into free landmark slots (reference:
    MapPoint ctor + UpdateNormalAndDepth). Returns (m, slot_of i32[N]) where
    slot_of[i] = L (the drop sentinel) if not allocated."""
    lms = m.lms
    L = lms.xyz.shape[0]
    N = X.shape[0]
    n_free = jnp.sum(~lms.valid)
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    can = mask & (rank < n_free)
    free_slots, = jnp.nonzero(~lms.valid, size=N, fill_value=L - 1)
    slot_of = jnp.where(can, free_slots[jnp.clip(rank, 0, N - 1)], L)

    cam_dist = jnp.linalg.norm(X - cam_center, axis=-1)
    scale = cfg.scale_factor ** octave.astype(jnp.float32)
    lev_factor = cfg.scale_factor ** (cfg.n_levels - 1)
    normal = (X - cam_center) / (cam_dist[..., None] + 1e-12)

    lms = lms._replace(
        xyz=lms.xyz.at[slot_of].set(X, mode="drop"),
        desc=lms.desc.at[slot_of].set(desc, mode="drop"),
        normal=lms.normal.at[slot_of].set(normal, mode="drop"),
        dmin=lms.dmin.at[slot_of].set(cam_dist * scale / lev_factor, mode="drop"),
        dmax=lms.dmax.at[slot_of].set(cam_dist * scale, mode="drop"),
        ref_kf=lms.ref_kf.at[slot_of].set(ref_kf, mode="drop"),
        # age reference is the creating KF's insertion number, not its slot
        # (slots are recycled after culling; seq is monotonic)
        first_seq=lms.first_seq.at[slot_of].set(m.kfs.seq[ref_kf], mode="drop"),
        n_obs=lms.n_obs.at[slot_of].set(0, mode="drop"),
        n_visible=lms.n_visible.at[slot_of].set(1, mode="drop"),
        n_found=lms.n_found.at[slot_of].set(1, mode="drop"),
        valid=lms.valid.at[slot_of].set(True, mode="drop"),
    )
    n_alloc = jnp.sum(can.astype(jnp.int32))
    # SURVEY.md §5 "no silent caps": candidates that didn't fit are counted,
    # not silently discarded — the host surfaces lm_dropped via pack_map_meta
    n_dropped = jnp.sum(mask.astype(jnp.int32)) - n_alloc
    m = m._replace(
        lms=lms,
        num_lms=m.num_lms + n_alloc,
        lm_dropped=m.lm_dropped + n_dropped,
    )
    return m, slot_of


def _fundamental_from_poses(R1, t1, R2, t2, Kmat):
    """F mapping image-1 points to epipolar lines in image 2."""
    R21 = R2 @ R1.T
    t21 = t2 - R21 @ t1
    E = geo.hat(t21) @ R21
    Kinv = jnp.linalg.inv(Kmat)
    return Kinv.T @ E @ Kinv


def _tri_candidates(
    Ra, ta, uv_a, desc_a, oct_a, free_a,
    Rb, tb, uv_b, desc_b, oct_b, free_b,
    cfg: EngineConfig,
):
    """Epipolar-gated match + triangulation checks for ONE keyframe pair.

    Pure function of the two keyframes' arrays — vmappable over neighbors
    (the fan-out's per-pair cost was the dominant slice of the per-keyframe
    mapping dispatch when run serially). Returns (X [F,3], good [F], jb [F]).
    """
    F = uv_a.shape[0]
    fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    Kmat = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)

    # --- epipolar-gated mutual match (a -> b) -------------------------
    dist = matching.hamming_distance_matrix(desc_a, desc_b)
    Fm = _fundamental_from_poses(Ra, ta, Rb, tb, Kmat)
    ua = jnp.concatenate([uv_a, jnp.ones((F, 1))], axis=-1)
    ub = jnp.concatenate([uv_b, jnp.ones((F, 1))], axis=-1)
    lines_b = ua @ Fm.T                                     # [F, 3]
    d_epi = (ub @ lines_b.T) ** 2 / (
        lines_b[:, 0] ** 2 + lines_b[:, 1] ** 2 + 1e-12
    ).T  # [Fb, Fa] -> careful: build [Fa, Fb]
    d_epi = d_epi.T
    sigma2_b = cfg.scale_factor ** (2.0 * oct_b.astype(jnp.float32))
    epi_ok = d_epi < 3.84 * sigma2_b[None, :]
    dist = jnp.where(epi_ok, dist, matching.MAX_DIST)
    mb, _ = matching.match_mutual(
        dist, free_a, free_b,
        max_dist=cfg.tri_match_max_dist, ratio=cfg.tri_match_ratio,
    )
    has = mb >= 0
    jb = jnp.clip(mb, 0, F - 1)

    # --- triangulate matched pairs ------------------------------------
    xa = (uv_a - jnp.array([cx, cy])) / jnp.array([fx, fy])
    xb = (uv_b[jb] - jnp.array([cx, cy])) / jnp.array([fx, fy])
    X = geo.triangulate_linear(Ra, ta, Rb, tb, xa, xb)      # world points [F, 3]

    za = geo.se3_apply(Ra, ta, X)[:, 2]
    zb = geo.se3_apply(Rb, tb, X)[:, 2]
    uv_ra, _ = geo.project(Ra, ta, X, fx, fy, cx, cy)
    uv_rb, _ = geo.project(Rb, tb, X, fx, fy, cx, cy)
    e_a = jnp.sum((uv_ra - uv_a) ** 2, -1)
    e_b = jnp.sum((uv_rb - uv_b[jb]) ** 2, -1)
    sigma2_a = cfg.scale_factor ** (2.0 * oct_a.astype(jnp.float32))
    # parallax between rays from the two camera centers
    ca = -Ra.T @ ta
    cb = -Rb.T @ tb
    r1 = X - ca
    r2 = X - cb
    cosp = jnp.sum(r1 * r2, -1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    good = (
        has
        & (za > 1e-3)
        & (zb > 1e-3)
        & (e_a < 5.991 * sigma2_a)
        & (e_b < 5.991 * sigma2_b[jb])
        & (cosp < 0.99995)
        & jnp.all(jnp.isfinite(X), -1)
    )
    return X, good, jb


@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate_between(
    m: MapState,
    slot_a: jax.Array,     # new keyframe
    slot_b: jax.Array,     # neighbor (e.g. reference) keyframe
    cfg: EngineConfig,
) -> MapState:
    """Create new landmarks from unmatched features of two keyframes.

    Reference: LocalMapping::CreateNewMapPoints — epipolar-gated descriptor
    match (SearchForTriangulation) then linear triangulation with cheirality,
    reprojection, and parallax checks. All candidates are processed as one
    masked batch; allocation packs survivors into free landmark slots.
    """
    return triangulate_fanout(m, slot_a, slot_b[None], cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate_fanout(
    m: MapState,
    slot_a: jax.Array,       # new keyframe
    neighbors: jax.Array,    # i32[Nn] neighbor slots (== slot_a: skip)
    cfg: EngineConfig,
) -> MapState:
    """Triangulate against ALL covisible neighbors in one vmapped pass.

    The serial per-neighbor loop cost ~4.4 ms x n_neighbors per keyframe on
    the chip; candidate generation has no cross-neighbor dependency, so it
    vmaps, and only conflict resolution (a feature triangulated against
    several neighbors keeps its FIRST — matching the reference's serial
    CreateNewMapPoints, where a feature with a fresh map point stops being
    free) and the single slot allocation stay sequential-in-spirit.
    """
    kfs = m.kfs
    F = kfs.uv.shape[1]
    L = m.lms.xyz.shape[0]
    Nn = neighbors.shape[0]
    nb_ok = neighbors != slot_a

    Ra, ta = kfs.R[slot_a], kfs.t[slot_a]
    uv_a, desc_a, oct_a = kfs.uv[slot_a], kfs.desc[slot_a], kfs.octave[slot_a]
    free_a = kfs.feat_valid[slot_a] & (kfs.obs_lm[slot_a] < 0)

    def one(nb, ok):
        free_b = kfs.feat_valid[nb] & (kfs.obs_lm[nb] < 0)
        X, good, jb = _tri_candidates(
            Ra, ta, uv_a, desc_a, oct_a, free_a,
            kfs.R[nb], kfs.t[nb], kfs.uv[nb], kfs.desc[nb], kfs.octave[nb],
            free_b, cfg,
        )
        return X, good & ok, jb

    Xs, goods, jbs = jax.vmap(one)(neighbors, nb_ok)   # [Nn, F, ...]

    # keep-first conflict resolution along the neighbor axis
    earlier = jnp.cumsum(goods.astype(jnp.int32), axis=0) - goods.astype(
        jnp.int32
    )
    keep = goods & (earlier == 0)                      # [Nn, F]

    # --- allocate all survivors in one pass ---------------------------
    flatX = Xs.reshape(Nn * F, 3)
    keep_f = keep.reshape(Nn * F)
    desc_rep = jnp.broadcast_to(desc_a[None], (Nn, F, 8)).reshape(Nn * F, 8)
    oct_rep = jnp.broadcast_to(oct_a[None], (Nn, F)).reshape(Nn * F)
    m, slot_of = alloc_landmarks(
        m, flatX, desc_rep, oct_rep, keep_f, slot_a, -Ra.T @ ta, cfg
    )
    can = slot_of < L                                   # [Nn*F]
    can2 = can.reshape(Nn, F)
    slot2 = slot_of.reshape(Nn, F)

    # register in slot_a: each feature has at most one kept candidate
    a_slot = jnp.min(jnp.where(can2, slot2, L), axis=0)  # [F]
    new_obs_a = jnp.where(a_slot < L, a_slot, m.kfs.obs_lm[slot_a])
    obs_lm = m.kfs.obs_lm.at[slot_a].set(new_obs_a)
    # register in each neighbor at its matched feature
    nb_rows = jnp.broadcast_to(neighbors[:, None], (Nn, F))
    k_idx = jnp.where(can2, nb_rows, m.kfs.valid.shape[0]).reshape(-1)
    f_idx = jbs.reshape(-1)
    obs_lm = obs_lm.at[k_idx, f_idx].set(
        jnp.where(can2, slot2, 0).reshape(-1), mode="drop"
    )
    lms = m.lms._replace(n_obs=m.lms.n_obs.at[slot_of].add(2, mode="drop"))
    m = m._replace(kfs=m.kfs._replace(obs_lm=obs_lm), lms=lms)
    return update_covis_for_kf(m, slot_a)


@functools.partial(jax.jit, static_argnames=("cfg",))
def spawn_depth_landmarks(m: MapState, slot: jax.Array, cfg: EngineConfig) -> MapState:
    """Create landmarks from a keyframe's depth channel (stereo/RGB-D).

    Reference: Tracking::CreateNewKeyFrame spawns close points
    (depth < ThDepth * baseline) for features without a map point; also the
    whole of StereoInitialization for the first keyframe.
    """
    kfs = m.kfs
    F = kfs.uv.shape[1]
    L = m.lms.xyz.shape[0]
    depth = kfs.depth[slot]
    cand = (
        kfs.feat_valid[slot]
        & (kfs.obs_lm[slot] < 0)
        & (depth > 0.0)
        & (depth < cfg.th_depth * jnp.maximum(cfg.baseline, 1e-6))
    )
    R, t = kfs.R[slot], kfs.t[slot]
    xn = (kfs.uv[slot] - jnp.array([cfg.cx, cfg.cy])) / jnp.array([cfg.fx, cfg.fy])
    Xc = jnp.concatenate([xn * depth[:, None], depth[:, None]], axis=-1)
    Rinv, tinv = geo.se3_inv(R, t)
    Xw = geo.se3_apply(Rinv, tinv, Xc)

    m, slot_of = alloc_landmarks(
        m, Xw, kfs.desc[slot], kfs.octave[slot], cand, slot, -R.T @ t, cfg
    )
    can = slot_of < L
    new_obs = jnp.where(can, slot_of, m.kfs.obs_lm[slot])
    obs_lm = m.kfs.obs_lm.at[slot].set(new_obs)
    lms = m.lms._replace(n_obs=m.lms.n_obs.at[slot_of].add(1, mode="drop"))
    return m._replace(kfs=m.kfs._replace(obs_lm=obs_lm), lms=lms)


@functools.partial(jax.jit, static_argnames=("cfg", "recount"))
def fuse_landmarks_into_kf(
    m: MapState,
    src_kf: jax.Array,     # landmarks of this keyframe are projected...
    dst_kf: jax.Array,     # ...into this keyframe
    cfg: EngineConfig,
    recount: bool = True,
) -> MapState:
    """Project src's landmarks into dst; add observations / merge duplicates.

    Reference: LocalMapping::SearchInNeighbors + ORBmatcher::Fuse. A match to
    a free dst feature adds an observation; a match to a feature already
    bound to a *different* landmark merges the two (the landmark with fewer
    observations is replaced everywhere by the one with more).
    """
    from . import tracking as _tracking  # local import to avoid a cycle

    kfs, lms = m.kfs, m.lms
    K, F = kfs.obs_lm.shape
    L = lms.xyz.shape[0]

    ids = kfs.obs_lm[src_kf]                       # i32[F] landmark per feature
    has = kfs.feat_valid[src_kf] & (ids >= 0)
    ids_s = jnp.where(has, ids, L)
    R_d, t_d = kfs.R[dst_kf], kfs.t[dst_kf]
    xyz, desc, uv_pred, octv, vis = _tracking._project_landmarks(
        m, ids_s, R_d, t_d, cfg, frustum=True
    )
    from . import matching as _matching

    match_ft, _ = _matching.match_projected(
        desc, uv_pred, vis, octv,
        kfs.desc[dst_kf], kfs.uv[dst_kf], kfs.feat_valid[dst_kf],
        kfs.octave[dst_kf],
        radius=3.0, scale_factor=cfg.scale_factor,
        max_dist=cfg.th_low, ratio=1.0,
    )
    ok = match_ft >= 0
    ft = jnp.clip(match_ft, 0, F - 1)
    cur = kfs.obs_lm[dst_kf][ft]                   # existing binding at dst
    lm_here = jnp.clip(ids_s, 0, L - 1)

    # case 1: free feature -> new observation
    free = ok & (cur < 0)
    obs_lm = kfs.obs_lm.at[dst_kf, jnp.where(free, ft, F)].set(
        jnp.where(free, lm_here, 0), mode="drop"
    )

    # case 2: bound to another landmark -> merge (keep the better-observed)
    dup = ok & (cur >= 0) & (cur != lm_here)
    cur_c = jnp.clip(cur, 0, L - 1)
    keep_cur = lms.n_obs[cur_c] >= lms.n_obs[lm_here]
    winner = jnp.where(keep_cur, cur_c, lm_here)
    loser = jnp.where(keep_cur, lm_here, cur_c)
    rep = jnp.arange(L, dtype=jnp.int32).at[jnp.where(dup, loser, L)].set(
        jnp.where(dup, winner, 0), mode="drop"
    )
    # one-step closure (avoid chains pointing at dead slots)
    rep = rep[rep]
    all_obs = jnp.where(obs_lm >= 0, rep[jnp.clip(obs_lm, 0, L - 1)], obs_lm)
    # NOTE: the global replace can leave one keyframe row with TWO features
    # bound to the same winning landmark (the loser's old feature + the
    # winner's). Deduping here would cost a [K, F]-sized pass on every fuse
    # call (measured ~15% of bench throughput); instead the BA problem
    # builders — the one place that assumes at-most-one-feature-per-landmark
    # per row — dedupe during extraction (local_ba.build_problem /
    # global_ba.build_global_problem, ADVICE r4).
    dead = jnp.zeros((L,), bool).at[jnp.where(dup, loser, L)].set(True, mode="drop")
    lms = lms._replace(valid=lms.valid & ~dead)
    m = m._replace(kfs=kfs._replace(obs_lm=all_obs), lms=lms)
    if recount:
        m = recount_lm_obs(m)
    return m


@functools.partial(jax.jit, static_argnames=("cfg",))
def refresh_landmark_descriptors(m: MapState, slot: jax.Array, cfg: EngineConfig) -> MapState:
    """Point each landmark's descriptor at its newest keyframe observation.

    Reference: MapPoint::ComputeDistinctiveDescriptors picks the min-median
    descriptor over all observations; tracking matches current frames against
    the map, so the newest view is the cheap high-value proxy (one scatter).
    """
    L = m.lms.xyz.shape[0]
    obs = m.kfs.obs_lm[slot]
    ok = m.kfs.feat_valid[slot] & (obs >= 0)
    tgt = jnp.where(ok, obs, L)
    desc = m.lms.desc.at[tgt].set(m.kfs.desc[slot], mode="drop")
    return m._replace(lms=m.lms._replace(desc=desc))


@functools.partial(jax.jit, static_argnames=("cfg",))
def refresh_landmark_geometry(m: MapState, slot: jax.Array, cfg: EngineConfig) -> MapState:
    """Update viewing normal + scale-invariance band for landmarks observed
    by keyframe `slot`.

    Reference: MapPoint::UpdateNormalAndDepth recomputes the mean viewing
    direction over ALL observations and the distance band from the reference
    observation. Here the normal blends toward the newest viewing ray (a
    running-mean proxy: one gather/scatter instead of a per-point
    observation walk) and the band re-anchors at the newest observation —
    keeping both current as the camera circles the point, which is what the
    isInFrustum gates in _project_landmarks consume.
    """
    lms = m.lms
    L = lms.xyz.shape[0]
    obs = m.kfs.obs_lm[slot]
    ok = m.kfs.feat_valid[slot] & (obs >= 0)
    safe = jnp.clip(obs, 0, L - 1)
    tgt = jnp.where(ok, obs, L)
    R, t = m.kfs.R[slot], m.kfs.t[slot]
    cam = -R.T @ t
    ray = lms.xyz[safe] - cam
    dist = jnp.linalg.norm(ray, axis=-1)
    rayn = ray / (dist[:, None] + 1e-12)
    blend = 0.7 * lms.normal[safe] + 0.3 * rayn
    blend = blend / (jnp.linalg.norm(blend, axis=-1, keepdims=True) + 1e-12)
    scale = cfg.scale_factor ** m.kfs.octave[slot].astype(jnp.float32)
    lev_factor = cfg.scale_factor ** (cfg.n_levels - 1)
    dmax_new = dist * scale
    lms = lms._replace(
        normal=lms.normal.at[tgt].set(blend, mode="drop"),
        dmax=lms.dmax.at[tgt].set(dmax_new, mode="drop"),
        dmin=lms.dmin.at[tgt].set(dmax_new / lev_factor, mode="drop"),
    )
    return m._replace(lms=lms)


def best_covisible(m: MapState, slot: int, n: int) -> list[int]:
    """Host-side: top-n covisible keyframe slots of `slot` (weight > 0)."""
    import numpy as np

    row = np.asarray(m.covis[slot])
    row = np.where(np.asarray(m.kfs.valid), row, 0)
    order = np.argsort(-row)
    return [int(k) for k in order[:n] if row[k] > 0]


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_keyframes(m: MapState, cur_kf: jax.Array, cfg: EngineConfig) -> MapState:
    """Remove redundant keyframes (reference: LocalMapping::KeyFrameCulling).

    A keyframe (other than the gauge anchors and the current one) is culled
    when >= 90% of its landmarks are observed by >= 3 other keyframes at the
    same or finer scale. Scale comparison uses the per-observation octave
    table; the per-landmark "seen elsewhere at <= my octave" counts come from
    one masked scatter over the whole observation table.
    """
    kfs, lms = m.kfs, m.lms
    K, F = kfs.obs_lm.shape
    L = lms.xyz.shape[0]

    obs_ok = kfs.valid[:, None] & kfs.feat_valid & (kfs.obs_lm >= 0)
    lm_of = jnp.clip(kfs.obs_lm, 0, L - 1)
    obs_ok = obs_ok & lms.valid[lm_of]
    octv = kfs.octave

    # per landmark: the minimum octave over observations per keyframe, via a
    # (L, n_oct) histogram of observing keyframes per octave level. The
    # scatter uses a single fused index (lm * n_oct + oct): TPU scatter-add
    # with one index dimension lowers much better than the 2-D form
    n_oct = cfg.n_levels
    flat_lm = jnp.where(obs_ok, lm_of, L).reshape(-1)
    flat_oc = jnp.clip(octv, 0, n_oct - 1).reshape(-1)
    flat_idx = flat_lm * n_oct + flat_oc
    counts = (
        jnp.zeros(((L + 1) * n_oct,), jnp.int32)
        .at[flat_idx]
        .add(1)
        .reshape(L + 1, n_oct)[:L]
    )
    # cum_at_or_below[l, o] = #obs of landmark l at octave <= o
    cum = jnp.cumsum(counts, axis=1)

    # for each observation (k, f): is this landmark seen by >= 3 OTHER KFs at
    # octave <= this one? approximate "other" by subtracting self (1).
    own_cum = cum[lm_of, jnp.clip(octv, 0, n_oct - 1)]      # [K, F]
    redundant_obs = obs_ok & ((own_cum - 1) >= 3)

    n_obs_kf = jnp.sum(obs_ok.astype(jnp.int32), axis=1)
    n_red_kf = jnp.sum(redundant_obs.astype(jnp.int32), axis=1)
    frac = n_red_kf.astype(jnp.float32) / jnp.maximum(n_obs_kf, 1).astype(jnp.float32)
    protected = (jnp.arange(K) <= 1) | (jnp.arange(K) == cur_kf) | (n_obs_kf < 10)
    cull = kfs.valid & ~protected & (frac > 0.9)
    # cull at most one keyframe per call (the most redundant), so the
    # spanning tree repair stays simple: children re-parent to its parent
    best = jnp.argmax(jnp.where(cull, frac, -1.0))
    do = cull[best]

    parent_of_best = kfs.parent[best]
    new_parent = jnp.where(
        do & (kfs.parent == best), parent_of_best, kfs.parent
    )
    valid = kfs.valid.at[best].set(jnp.where(do, False, kfs.valid[best]))
    # clear its observations
    clear = do & (jnp.arange(K) == best)[:, None]
    obs_lm = jnp.where(clear, INVALID_ID, kfs.obs_lm)
    covis = m.covis
    covis = jnp.where(do, covis.at[best, :].set(0).at[:, best].set(0), covis)
    # record T_rp = T_rw o T_pw^-1 against the parent AT CULL TIME (the
    # reference's KeyFrame::SetBadFlag mTcp): trajectory re-anchoring on the
    # host composes against this exact-relative transform, so parent-pose
    # moves from later BA / loop closure propagate without error
    safe_p = jnp.clip(parent_of_best, 0, K - 1)
    R_rp = kfs.R[best] @ kfs.R[safe_p].T
    t_rp = kfs.t[best] - R_rp @ kfs.t[safe_p]
    cull_parent = kfs.cull_parent.at[best].set(
        jnp.where(do, parent_of_best, kfs.cull_parent[best])
    )
    cull_seq = kfs.cull_seq.at[best].set(
        jnp.where(do, kfs.seq[best], kfs.cull_seq[best])
    )
    cull_R = kfs.cull_R.at[best].set(
        jnp.where(do, R_rp, kfs.cull_R[best])
    )
    cull_t = kfs.cull_t.at[best].set(
        jnp.where(do, t_rp, kfs.cull_t[best])
    )
    # incremental observation-count update: only the culled keyframe's row
    # left the observation table, so subtract its contributions instead of
    # re-scanning the whole [K, F] table (a full recount_lm_obs is ~3.5 ms
    # of serialized scatter at bench capacities, every keyframe)
    row = kfs.obs_lm[best]
    row_ok = do & kfs.feat_valid[best] & (row >= 0)
    sub = (
        jnp.zeros((L + 1,), jnp.int32)
        .at[jnp.where(row_ok, jnp.clip(row, 0, L - 1), L)]
        .add(1, mode="drop")[:L]
    )
    lms2 = m.lms._replace(n_obs=jnp.maximum(m.lms.n_obs - sub, 0))
    return m._replace(
        kfs=kfs._replace(
            valid=valid, parent=new_parent, obs_lm=obs_lm,
            cull_parent=cull_parent, cull_seq=cull_seq,
            cull_R=cull_R, cull_t=cull_t,
        ),
        covis=covis,
        lms=lms2,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "spawn_depth", "n_neighbors", "n_two_hop")
)
def process_new_keyframe(
    m: MapState,
    frame: FrameArrays,
    R: jax.Array,
    t: jax.Array,
    lm_ids: jax.Array,
    frame_id: jax.Array,
    timestamp: jax.Array,
    slot: jax.Array,
    parent: jax.Array,
    cfg: EngineConfig,
    spawn_depth: bool = False,
    n_neighbors: int = 4,
    n_two_hop: int | None = None,
) -> MapState:
    """The whole keyframe pipeline as ONE device dispatch.

    Insert, (stereo/RGB-D) depth spawning, triangulation + duplicate fusion
    against the top covisible neighbors (selected on device) plus their own
    best neighbors (the reference's two-hop SearchInNeighbors set),
    covisibility refresh, descriptor refresh, and landmark culling — the
    reference's LocalMapping::Run body minus the thread (SURVEY.md §7.1
    rule 1); the follow-up local BA is a separate dispatch (optim/local_ba).
    """
    if n_two_hop is None:
        n_two_hop = cfg.kf_fuse_two_hop
    m = insert_keyframe(
        m, frame, R, t, lm_ids, frame_id, timestamp, slot, parent, cfg
    )
    if spawn_depth:
        m = spawn_depth_landmarks(m, slot, cfg)

    K = m.kfs.valid.shape[0]
    w = jnp.where(m.kfs.valid, m.covis[slot], 0).at[slot].set(0)
    top_w, neighbors = jax.lax.top_k(w, n_neighbors)
    neighbors = jnp.where(top_w > 0, neighbors, slot)  # self == skip

    # all neighbor pairs triangulated in one vmapped pass (the serial
    # per-neighbor loop was the dominant slice of this dispatch)
    m = triangulate_fanout(m, slot, neighbors, cfg)

    # fusion fan-out: the one-hop set plus the strongest second-degree
    # neighbors (reference: LocalMapping::SearchInNeighbors extends the
    # target set with each neighbor's own best covisible keyframes)
    fuse_targets = neighbors
    if n_two_hop > 0:
        one_hop = jnp.zeros((K,), bool).at[
            jnp.where(top_w > 0, neighbors, K)
        ].set(True, mode="drop")
        rows = jnp.where(
            (top_w > 0)[:, None], m.covis[neighbors], 0
        )                                                   # [n_neighbors, K]
        w2 = jnp.max(rows, axis=0)
        w2 = jnp.where(m.kfs.valid & ~one_hop, w2, 0).at[slot].set(0)
        top_w2, nb2 = jax.lax.top_k(w2, n_two_hop)
        nb2 = jnp.where(top_w2 > 0, nb2, slot)
        fuse_targets = jnp.concatenate([neighbors, nb2])

    def fuse_body(i, m):
        nb = fuse_targets[i]

        def do(mm):
            mm = fuse_landmarks_into_kf(mm, slot, nb, cfg, recount=False)
            return fuse_landmarks_into_kf(mm, nb, slot, cfg, recount=False)

        return jax.lax.cond(nb != slot, do, lambda mm: mm, m)

    m = jax.lax.fori_loop(0, fuse_targets.shape[0], fuse_body, m)
    m = recount_lm_obs(m)
    m = update_covis_for_kf(m, slot)
    m = refresh_landmark_descriptors(m, slot, cfg)
    m = refresh_landmark_geometry(m, slot, cfg)
    m = cull_landmarks(m, slot, cfg)
    m = cull_keyframes(m, slot, cfg)
    return m


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_landmarks(m: MapState, cur_kf: jax.Array, cfg: EngineConfig) -> MapState:
    """Remove weak landmarks (reference: LocalMapping::MapPointCulling).

    Culls points whose found/visible ratio is poor (checked only while the
    point is young — the reference's mlpRecentAddedMapPoints window; old
    points keep their tenure like the reference's) or that stayed
    under-observed several keyframes after creation.
    """
    lms = m.lms
    ratio = lms.n_found.astype(jnp.float32) / jnp.maximum(
        lms.n_visible.astype(jnp.float32), 1.0
    )
    cur_seq = m.kfs.seq[cur_kf]
    age = cur_seq - lms.first_seq
    bad = lms.valid & (
        ((ratio < 0.25) & (age <= 3)) | ((age >= 2) & (lms.n_obs <= 2))
    )
    # keep points the current KF just created
    bad = bad & (lms.first_seq != cur_seq)
    lms = lms._replace(valid=lms.valid & ~bad)
    # clear dangling observations
    K, F = m.kfs.obs_lm.shape
    L = lms.xyz.shape[0]
    obs = m.kfs.obs_lm
    obs_bad = (obs >= 0) & bad[jnp.clip(obs, 0, L - 1)]
    obs = jnp.where(obs_bad, INVALID_ID, obs)
    return m._replace(kfs=m.kfs._replace(obs_lm=obs), lms=lms)
