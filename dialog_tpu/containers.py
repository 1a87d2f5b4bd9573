"""Device-resident map data model: static-capacity SoA pytrees.

TPU-native replacement for the reference's pointer-graph map (canonical layout:
src/Frame.cc, src/KeyFrame.cc, src/MapPoint.cc, src/Map.cc — SURVEY.md §2.1).
Where the reference holds heap objects linked by pointers and guarded by
mutexes, this engine keeps one immutable pytree of fixed-capacity arrays in
HBM; "allocation" is a mask flip, "deletion" is a mask clear, and every update
is a pure function MapState -> MapState. This removes the reference's entire
mutex/race surface (SURVEY.md §5 "Race detection").

Observation bookkeeping: the single source of truth is ``KeyframeStore.obs_lm``
(per-keyframe, per-feature landmark id, -1 = none). Per-landmark observation
counts and the covisibility matrix are maintained incrementally by scatter ops
from that table (the reference maintains both directions by hand in
MapPoint::AddObservation / KeyFrame::AddConnection).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import EngineConfig

INVALID_ID = -1


class FrameArrays(NamedTuple):
    """One frame's features (reference: Frame — src/Frame.cc).

    Capacity F = cfg.max_features; ``valid`` masks live slots.
    """

    uv: jax.Array        # f32[F, 2]  undistorted pixel coords
    uv_raw: jax.Array    # f32[F, 2]  raw (distorted) pixel coords
    response: jax.Array  # f32[F]
    octave: jax.Array    # i32[F]     pyramid level
    angle: jax.Array     # f32[F]     orientation (radians)
    desc: jax.Array      # u32[F, 8]  256-bit binary descriptor
    valid: jax.Array     # bool[F]
    u_right: jax.Array   # f32[F]     stereo right-x; <0 = monocular feature
    depth: jax.Array     # f32[F]     metric depth; <=0 = unknown


def empty_frame(F: int) -> FrameArrays:
    return FrameArrays(
        uv=jnp.zeros((F, 2), jnp.float32),
        uv_raw=jnp.zeros((F, 2), jnp.float32),
        response=jnp.zeros((F,), jnp.float32),
        octave=jnp.zeros((F,), jnp.int32),
        angle=jnp.zeros((F,), jnp.float32),
        desc=jnp.zeros((F, 8), jnp.uint32),
        valid=jnp.zeros((F,), bool),
        u_right=-jnp.ones((F,), jnp.float32),
        depth=-jnp.ones((F,), jnp.float32),
    )


class KeyframeStore(NamedTuple):
    """All keyframes, SoA (reference: KeyFrame — src/KeyFrame.cc).

    K = cfg.max_keyframes, F = cfg.max_features.
    """

    R: jax.Array          # f32[K, 3, 3]  world->camera rotation
    t: jax.Array          # f32[K, 3]
    uv: jax.Array         # f32[K, F, 2]
    desc: jax.Array       # u32[K, F, 8]
    octave: jax.Array     # i32[K, F]
    angle: jax.Array      # f32[K, F]
    u_right: jax.Array    # f32[K, F]
    depth: jax.Array      # f32[K, F]
    feat_valid: jax.Array # bool[K, F]
    obs_lm: jax.Array     # i32[K, F]   landmark id per feature (-1 = none)
    valid: jax.Array      # bool[K]     alive keyframes
    frame_id: jax.Array   # i32[K]      source frame index
    timestamp: jax.Array  # f64[K]
    parent: jax.Array     # i32[K]      spanning-tree parent (-1 = root)
    seq: jax.Array        # i32[K]      monotonic insertion number (slot reuse
                          #             makes slot indices non-monotonic; age
                          #             tests must use seq, never slots)
    # cull-time record (reference: KeyFrame::SetBadFlag stores mTcp): the
    # relative transform T_rp = T_rw o T_pw^-1 to the spanning-tree parent,
    # captured ON DEVICE at the moment of culling. Trajectory re-anchoring
    # composes against this instead of a (possibly stale) host snapshot —
    # later BA/pose-graph moves of the parent then propagate correctly.
    cull_parent: jax.Array  # i32[K]    parent at cull time (-1 = never culled)
    cull_seq: jax.Array     # i32[K]    seq of the culled KF (stale-slot guard)
    cull_R: jax.Array       # f32[K, 3, 3]  R of T_rp at cull time
    cull_t: jax.Array       # f32[K, 3]     t of T_rp at cull time


class LandmarkStore(NamedTuple):
    """All landmarks, SoA (reference: MapPoint — src/MapPoint.cc).

    L = cfg.max_landmarks.
    """

    xyz: jax.Array        # f32[L, 3]
    desc: jax.Array       # u32[L, 8]   distinctive descriptor
    normal: jax.Array     # f32[L, 3]   mean viewing direction
    dmin: jax.Array       # f32[L]      scale-invariance distance band
    dmax: jax.Array       # f32[L]
    ref_kf: jax.Array     # i32[L]     creating keyframe SLOT (indexes kfs)
    first_seq: jax.Array  # i32[L]     creating keyframe's insertion number
                          #            (slot-reuse-safe age reference)
    n_obs: jax.Array      # i32[L]      number of observing keyframes
    n_visible: jax.Array  # i32[L]      times predicted visible (found-ratio)
    n_found: jax.Array    # i32[L]      times actually matched
    valid: jax.Array      # bool[L]


class MapState(NamedTuple):
    """The whole map (reference: Map — src/Map.cc), one pytree in HBM."""

    kfs: KeyframeStore
    lms: LandmarkStore
    covis: jax.Array      # i32[K, K]  covisibility weights (shared-landmark counts)
    num_kfs: jax.Array    # i32 scalar: keyframes ever allocated (monotonic high-water)
    num_lms: jax.Array    # i32 scalar
    lm_dropped: jax.Array # i32 scalar: landmark candidates dropped because the
                          # freelist was empty (SURVEY.md §5 "no silent caps" —
                          # surfaced to the host via pack_map_meta)


def empty_map(cfg: EngineConfig) -> MapState:
    K, F, L = cfg.max_keyframes, cfg.max_features, cfg.max_landmarks
    kfs = KeyframeStore(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)).copy(),
        t=jnp.zeros((K, 3), jnp.float32),
        uv=jnp.zeros((K, F, 2), jnp.float32),
        desc=jnp.zeros((K, F, 8), jnp.uint32),
        octave=jnp.zeros((K, F), jnp.int32),
        angle=jnp.zeros((K, F), jnp.float32),
        u_right=-jnp.ones((K, F), jnp.float32),
        depth=-jnp.ones((K, F), jnp.float32),
        feat_valid=jnp.zeros((K, F), bool),
        obs_lm=jnp.full((K, F), INVALID_ID, jnp.int32),
        valid=jnp.zeros((K,), bool),
        frame_id=jnp.full((K,), INVALID_ID, jnp.int32),
        timestamp=jnp.zeros((K,), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
        parent=jnp.full((K,), INVALID_ID, jnp.int32),
        seq=jnp.full((K,), INVALID_ID, jnp.int32),
        cull_parent=jnp.full((K,), INVALID_ID, jnp.int32),
        cull_seq=jnp.full((K,), INVALID_ID, jnp.int32),
        cull_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)).copy(),
        cull_t=jnp.zeros((K, 3), jnp.float32),
    )
    lms = LandmarkStore(
        xyz=jnp.zeros((L, 3), jnp.float32),
        desc=jnp.zeros((L, 8), jnp.uint32),
        normal=jnp.zeros((L, 3), jnp.float32),
        dmin=jnp.zeros((L,), jnp.float32),
        dmax=jnp.full((L,), jnp.inf, jnp.float32),
        ref_kf=jnp.full((L,), INVALID_ID, jnp.int32),
        first_seq=jnp.full((L,), INVALID_ID, jnp.int32),
        n_obs=jnp.zeros((L,), jnp.int32),
        n_visible=jnp.zeros((L,), jnp.int32),
        n_found=jnp.zeros((L,), jnp.int32),
        valid=jnp.zeros((L,), bool),
    )
    return MapState(
        kfs=kfs,
        lms=lms,
        covis=jnp.zeros((K, K), jnp.int32),
        num_kfs=jnp.zeros((), jnp.int32),
        num_lms=jnp.zeros((), jnp.int32),
        lm_dropped=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Allocation helpers (mask-flip "allocation"; SURVEY.md §7.1 rule 2)
# ---------------------------------------------------------------------------


def first_free_kf_slot(m: MapState) -> jax.Array:
    """Index of the first dead keyframe slot (i32 scalar)."""
    return jnp.argmin(m.kfs.valid)  # False < True; all-True -> 0 (overflow)


def free_lm_slots(m: MapState, n: int) -> jax.Array:
    """First ``n`` free landmark slot indices (i32[n]).

    If fewer than n are free, trailing entries repeat the fill value (slot 0 of
    the free set or index L-1); callers must mask by ``lm_capacity_left``.
    """
    idx, = jnp.nonzero(~m.lms.valid, size=n, fill_value=m.lms.valid.shape[0] - 1)
    return idx.astype(jnp.int32)


def lm_capacity_left(m: MapState) -> jax.Array:
    return jnp.sum(~m.lms.valid).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Keyframe bookkeeping snapshot (host slot allocator + trajectory re-anchor)
# ---------------------------------------------------------------------------


@jax.jit
def pack_map_meta(m: MapState) -> jax.Array:
    """Keyframe bookkeeping as ONE f32 vector: [valid | parent | seq | R | t].

    The host's keyframe-slot freelist and the culled-KF trajectory re-anchor
    (reference: KeyFrame::SetBadFlag storing mTcp + SaveTrajectoryTUM's
    bad-keyframe parent walk) consume this; it rides the per-batch async D2H
    pull so slot recycling never adds a blocking transfer.
    """
    K = m.kfs.valid.shape[0]
    return jnp.concatenate(
        [
            m.kfs.valid.astype(jnp.float32),
            m.kfs.parent.astype(jnp.float32),
            m.kfs.seq.astype(jnp.float32),
            m.kfs.R.reshape(K * 9),
            m.kfs.t.reshape(K * 3),
            m.kfs.cull_parent.astype(jnp.float32),
            m.kfs.cull_seq.astype(jnp.float32),
            m.kfs.cull_R.reshape(K * 9),
            m.kfs.cull_t.reshape(K * 3),
            m.lm_dropped.astype(jnp.float32)[None],
        ]
    )


class MapMeta:
    """Host-side view of pack_map_meta (one attribute per packed field)."""

    __slots__ = (
        "valid", "parent", "seq", "R", "t",
        "cull_parent", "cull_seq", "cull_R", "cull_t", "lm_dropped",
    )

    def __init__(self, meta, K: int):
        import numpy as np

        meta = np.asarray(meta)
        self.valid = meta[:K] > 0.5
        self.parent = meta[K : 2 * K].astype(np.int32)
        self.seq = meta[2 * K : 3 * K].astype(np.int32)
        self.R = meta[3 * K : 12 * K].reshape(K, 3, 3)
        self.t = meta[12 * K : 15 * K].reshape(K, 3)
        self.cull_parent = meta[15 * K : 16 * K].astype(np.int32)
        self.cull_seq = meta[16 * K : 17 * K].astype(np.int32)
        self.cull_R = meta[17 * K : 26 * K].reshape(K, 3, 3)
        self.cull_t = meta[26 * K : 29 * K].reshape(K, 3)
        self.lm_dropped = int(meta[29 * K])


def parse_map_meta(meta, K: int):
    """Host-side inverse of pack_map_meta -> (valid, parent, seq, R, t)."""
    mm = MapMeta(meta, K)
    return mm.valid, mm.parent, mm.seq, mm.R, mm.t


# ---------------------------------------------------------------------------
# Covisibility maintenance (reference: KeyFrame::UpdateConnections)
# ---------------------------------------------------------------------------


def covis_row_for_kf(m: MapState, k: jax.Array) -> jax.Array:
    """Recompute covisibility weights of keyframe k vs all keyframes.

    weight[j] = #landmarks observed by both k and j. Computed by marking k's
    landmark set and gathering through every keyframe's obs_lm table — one
    scatter + one gather instead of the reference's per-point map walk.
    Returns i32[K] with weight[k] = 0.
    """
    L = m.lms.xyz.shape[0]
    obs_k = m.kfs.obs_lm[k]                    # i32[F]
    ok = (obs_k >= 0) & m.kfs.feat_valid[k]
    mark = jnp.zeros((L + 1,), jnp.int32).at[jnp.where(ok, obs_k, L)].set(1)
    mark = mark[:L]                            # membership of k's landmarks
    all_obs = m.kfs.obs_lm                     # i32[K, F]
    hits = jnp.where(
        (all_obs >= 0) & m.kfs.feat_valid, mark[jnp.clip(all_obs, 0, L - 1)], 0
    )
    w = jnp.sum(hits, axis=1).astype(jnp.int32)
    w = jnp.where(m.kfs.valid, w, 0)
    return w.at[k].set(0)


def update_covis_for_kf(m: MapState, k: jax.Array) -> MapState:
    w = covis_row_for_kf(m, k)
    covis = m.covis.at[k, :].set(w).at[:, k].set(w)
    return m._replace(covis=covis)


def recount_lm_obs(m: MapState) -> MapState:
    """Recompute per-landmark observation counts from obs_lm (scatter-add)."""
    L = m.lms.xyz.shape[0]
    obs = m.kfs.obs_lm
    ok = (obs >= 0) & m.kfs.feat_valid & m.kfs.valid[:, None]
    flat = jnp.where(ok, obs, L).reshape(-1)
    counts = jnp.zeros((L + 1,), jnp.int32).at[flat].add(1)[:L]
    return m._replace(lms=m.lms._replace(n_obs=counts))


# ---------------------------------------------------------------------------
# Checkpoint (reference has none — SURVEY.md §5 "Checkpoint / resume")
# ---------------------------------------------------------------------------


def save_map(m: MapState, path: str) -> None:
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten(m)
    np.savez_compressed(path, *[np.asarray(x) for x in flat])


def load_map(cfg: EngineConfig, path: str) -> MapState:
    import numpy as np

    template = empty_map(cfg)
    flat, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        arrs = [jnp.asarray(data[k]) for k in data.files]
    if len(arrs) != len(flat):
        raise ValueError(
            f"checkpoint has {len(arrs)} arrays, expected {len(flat)} "
            "(capacity/config mismatch?)"
        )
    for i, (got, want) in enumerate(zip(arrs, flat)):
        if got.shape != want.shape:
            raise ValueError(
                f"checkpoint array {i} has shape {got.shape}, expected "
                f"{want.shape} (capacity/config mismatch?)"
            )
    return jax.tree_util.tree_unflatten(treedef, arrs)
