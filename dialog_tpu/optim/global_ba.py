"""Global bundle adjustment, landmark-sharded across the device mesh.

Replaces the reference's ``Optimizer::GlobalBundleAdjustemnt`` [sic]
(canonical ``src/Optimizer.cc`` — SURVEY.md §2.1) and provides the
multi-chip scaling axis mandated by BASELINE.json: landmarks (and their
fixed-width observation lists) are sharded over the mesh's data axis, the
camera system stays replicated, and XLA inserts the ``psum``-style
all-reduces when the per-shard Schur contributions scatter into the
replicated reduced system (SURVEY.md §2.3 "Distributed BA = landmark-sharded
Schur reduction").

The numerical kernel is the same blocked Schur LM as ``local_ba.solve_ba``
— only the problem extraction (all keyframes, all landmarks) and the
sharding annotations differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..containers import MapState
from .local_ba import BAProblem, solve_ba, write_back


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_global_problem(m: MapState, cfg: EngineConfig):
    """All valid keyframes + all valid landmarks as one BAProblem.

    Camera index == keyframe slot (C = max_keyframes). The first two
    keyframes are frozen as the gauge/scale anchor (reference fixes KF0;
    monocular needs a second anchor for scale).

    Returns ``(prob, n_obs_dropped)``: the second value counts observations
    beyond the fixed ``max_obs_per_lm`` width that were truncated (the
    reference's ``MapPoint::AddObservation`` map is unbounded; SURVEY.md §5
    "no silent caps" requires surfacing the cap — VERDICT r4 directive 6).
    """
    K, F = m.kfs.obs_lm.shape
    L = m.lms.xyz.shape[0]
    O = cfg.max_obs_per_lm

    cam_slots = jnp.arange(K, dtype=jnp.int32)
    cam_opt = m.kfs.valid & (cam_slots >= 2)

    rows_ok = m.kfs.valid[:, None] & m.kfs.feat_valid & (m.kfs.obs_lm >= 0)
    safe = jnp.clip(m.kfs.obs_lm, 0, L - 1)
    li_flat = jnp.where(rows_ok & m.lms.valid[safe], safe, L).reshape(-1)
    # (landmark, keyframe)-lexicographic order with NO composite key (a
    # li*K+cam key overflows i32 once max_landmarks*max_keyframes crosses
    # 2^31): cam_flat = index // F is non-decreasing by construction, so a
    # single STABLE argsort by landmark id preserves the keyframe order
    # within each landmark group. Duplicates of one landmark within one
    # keyframe row (possible after fusion's global replace — ADVICE r4)
    # land adjacent and all but the first are dropped.
    cam_flat = (
        jnp.arange(K * F, dtype=jnp.int32) // F
    )
    order = jnp.argsort(li_flat, stable=True)
    sorted_li = li_flat[order]
    sorted_cam = cam_flat[order]
    dup = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (sorted_li[1:] == sorted_li[:-1])
            & (sorted_cam[1:] == sorted_cam[:-1]),
        ]
    ) & (sorted_li < L)
    first = jnp.searchsorted(sorted_li, sorted_li, side="left")
    # rank among the NON-duplicate entries of the landmark's group, so a
    # dropped duplicate leaves no hole in the fixed-width observation list
    nd = (~dup & (sorted_li < L)).astype(jnp.int32)
    cum_excl = jnp.cumsum(nd) - nd
    rank = cum_excl - cum_excl[first]
    keep = (sorted_li < L) & ~dup & (rank < O)
    # truncation counter excludes the spurious duplicates
    n_dropped = jnp.sum((sorted_li < L) & ~dup & (rank >= O))
    tgt_l = jnp.where(keep, sorted_li, L)
    tgt_o = jnp.where(keep, rank, 0)

    cam_of = (order // F).astype(jnp.int32)
    feat_of = (order % F).astype(jnp.int32)
    obs_cam = jnp.full((L, O), K, jnp.int32).at[tgt_l, tgt_o].set(cam_of, mode="drop")
    obs_feat = jnp.zeros((L, O), jnp.int32).at[tgt_l, tgt_o].set(feat_of, mode="drop")
    obs_ok = jnp.zeros((L, O), bool).at[tgt_l, tgt_o].set(keep, mode="drop")

    safe_cam = jnp.clip(obs_cam, 0, K - 1)
    obs_uv = m.kfs.uv[safe_cam, obs_feat]
    obs_oct = m.kfs.octave[safe_cam, obs_feat]
    obs_ur = (
        jnp.where(obs_ok, m.kfs.u_right[safe_cam, obs_feat], -1.0)
        if cfg.bf > 0
        else None   # static: mono configs never pay the stereo gather
    )
    obs_w = cfg.scale_factor ** (-2.0 * obs_oct.astype(jnp.float32))
    obs_w = jnp.where(obs_ok, obs_w, 0.0)

    prob = BAProblem(
        cam_slots=cam_slots,
        cam_opt=cam_opt,
        R=m.kfs.R,
        t=m.kfs.t,
        lm_ids=jnp.where(m.lms.valid, jnp.arange(L, dtype=jnp.int32), L),
        xyz=m.lms.xyz,
        obs_cam=obs_cam,
        obs_uv=obs_uv,
        obs_w=obs_w,
        obs_ok=obs_ok,
        obs_feat=obs_feat,
        obs_ur=obs_ur,
    )
    return prob, n_dropped


def shard_problem(prob: BAProblem, mesh: Mesh, axis=None) -> BAProblem:
    """Place the landmark axis of the problem on the mesh; cameras replicated.

    XLA turns the scatter-adds into the replicated reduced camera system into
    cross-shard all-reduces over ICI — the 'pick a mesh, annotate shardings'
    recipe rather than hand-written collectives. By default landmarks shard
    over ALL mesh axes flattened (works for both a flat ('data',) mesh and
    the engine's ('hosts', 'chips') topology mesh).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)
    lm_sharded = NamedSharding(mesh, P(axis))
    lm_sharded2 = NamedSharding(mesh, P(axis, None))
    lm_sharded3 = NamedSharding(mesh, P(axis, None, None))
    repl = NamedSharding(mesh, P())
    return BAProblem(
        cam_slots=jax.device_put(prob.cam_slots, repl),
        cam_opt=jax.device_put(prob.cam_opt, repl),
        R=jax.device_put(prob.R, repl),
        t=jax.device_put(prob.t, repl),
        lm_ids=jax.device_put(prob.lm_ids, lm_sharded),
        xyz=jax.device_put(prob.xyz, lm_sharded2),
        obs_cam=jax.device_put(prob.obs_cam, lm_sharded2),
        obs_uv=jax.device_put(prob.obs_uv, lm_sharded3),
        obs_w=jax.device_put(prob.obs_w, lm_sharded2),
        obs_ok=jax.device_put(prob.obs_ok, lm_sharded2),
        obs_feat=jax.device_put(prob.obs_feat, lm_sharded2),
        obs_ur=(
            None
            if prob.obs_ur is None
            else jax.device_put(prob.obs_ur, lm_sharded2)
        ),
        lm_opt=(
            None
            if prob.lm_opt is None
            else jax.device_put(prob.lm_opt, lm_sharded)
        ),
    )


# camera count above which the dense reduced system is replaced by the
# matrix-free Schur PCG (schur_pcg.solve_ba_pcg): forming S costs
# O((6C)^2 3P) flops and (6C)^2 memory — at the KITTI00 preset's C=2048
# that is minutes per LM iteration, vs milliseconds for the implicit solve
DENSE_SCHUR_MAX_CAMS = 192


class GBASnapshot:
    """Identity snapshot taken when an asynchronous GBA starts.

    Keyframes are identified by their insertion number (``seq``) and
    landmarks by ``(first_seq, ref_kf)`` — both survive slot recycling, so a
    slot culled and reused during the GBA window is recognized as a *new*
    entity and re-anchored instead of being overwritten with a stale
    optimum.
    """

    __slots__ = ("kf_seq", "kf_valid", "lm_valid", "lm_first_seq", "lm_ref")

    def __init__(self, m: MapState):
        self.kf_seq = m.kfs.seq
        self.kf_valid = m.kfs.valid
        self.lm_valid = m.lms.valid
        self.lm_first_seq = m.lms.first_seq
        self.lm_ref = m.lms.ref_kf


@functools.partial(jax.jit, static_argnames=())
def fold_gba_result(
    m: MapState,
    kf_seq_snap: jax.Array,     # i32[K] snapshot insertion numbers
    kf_valid_snap: jax.Array,   # bool[K]
    lm_valid_snap: jax.Array,   # bool[L]
    lm_first_snap: jax.Array,   # i32[L]
    lm_ref_snap: jax.Array,     # i32[L]
    R_opt: jax.Array,           # f32[K, 3, 3] optimized snapshot poses
    t_opt: jax.Array,           # f32[K, 3]
    xyz_opt: jax.Array,         # f32[L, 3] optimized snapshot landmarks
) -> MapState:
    """Merge an asynchronously-computed GBA result into the LIVE map.

    The TPU-native analog of the reference's
    ``LoopClosing::RunGlobalBundleAdjustment`` merge: keyframes that existed
    at snapshot time take their optimized pose outright; keyframes created
    (or slots recycled) during the GBA window walk the spanning tree to
    their nearest snapshot ancestor ``a`` and are re-based so their relative
    pose to ``a`` is preserved (``T_new = T_cur T_a_cur^-1 T_a_opt``).
    Landmarks likewise: snapshot landmarks take ``xyz_opt``; new landmarks
    move with their reference keyframe's correction
    (``X_new = T_a_opt^-1 (T_a_cur X)``). All one masked device pass — no
    pointer walk, no map mutex.
    """
    K = m.kfs.valid.shape[0]
    L = m.lms.xyz.shape[0]

    same_kf = m.kfs.valid & kf_valid_snap & (m.kfs.seq == kf_seq_snap)

    # nearest snapshot ancestor along the parent tree (bounded walk; new
    # keyframes during a GBA window form a short chain)
    anchor = jnp.arange(K, dtype=jnp.int32)

    def hop(a):
        need = (a >= 0) & ~same_kf[jnp.clip(a, 0, K - 1)]
        return jnp.where(need, m.kfs.parent[jnp.clip(a, 0, K - 1)], a)

    for _ in range(16):
        anchor = hop(anchor)
    anchored = (anchor >= 0) & same_kf[jnp.clip(anchor, 0, K - 1)]
    a = jnp.clip(anchor, 0, K - 1)

    R_cur, t_cur = m.kfs.R, m.kfs.t
    Ra_cur, ta_cur = R_cur[a], t_cur[a]
    Ra_opt, ta_opt = R_opt[a], t_opt[a]
    # T_rel = T_cur o T_a_cur^-1 ; T_new = T_rel o T_a_opt
    R_rel = jnp.einsum("kij,kmj->kim", R_cur, Ra_cur)
    t_rel = t_cur - jnp.einsum("kij,kj->ki", R_rel, ta_cur)
    R_reb = jnp.einsum("kij,kjm->kim", R_rel, Ra_opt)
    t_reb = jnp.einsum("kij,kj->ki", R_rel, ta_opt) + t_rel

    new_kf = m.kfs.valid & ~same_kf & anchored
    R_out = jnp.where(
        same_kf[:, None, None], R_opt, jnp.where(new_kf[:, None, None], R_reb, R_cur)
    )
    t_out = jnp.where(
        same_kf[:, None], t_opt, jnp.where(new_kf[:, None], t_reb, t_cur)
    )

    # landmarks
    same_lm = (
        m.lms.valid
        & lm_valid_snap
        & (m.lms.first_seq == lm_first_snap)
        & (m.lms.ref_kf == lm_ref_snap)
    )
    ref = jnp.clip(m.lms.ref_kf, 0, K - 1)
    la = jnp.clip(anchor[ref], 0, K - 1)
    la_ok = (m.lms.ref_kf >= 0) & (anchor[ref] >= 0) & same_kf[la]
    Rla_cur, tla_cur = R_cur[la], t_cur[la]
    Rla_opt, tla_opt = R_opt[la], t_opt[la]
    X = m.lms.xyz
    Xc = jnp.einsum("lij,lj->li", Rla_cur, X) + tla_cur
    X_reb = jnp.einsum("lji,lj->li", Rla_opt, Xc - tla_opt)
    new_lm = m.lms.valid & ~same_lm & la_ok
    xyz_out = jnp.where(
        same_lm[:, None], xyz_opt, jnp.where(new_lm[:, None], X_reb, X)
    )

    return m._replace(
        kfs=m.kfs._replace(R=R_out, t=t_out),
        lms=m.lms._replace(xyz=xyz_out),
    )


def global_bundle_adjustment(
    m: MapState,
    cfg: EngineConfig,
    iters: int = 20,
    mesh: Mesh | None = None,
    stats: dict | None = None,
) -> MapState:
    """Full-map BA; landmark-sharded over `mesh` when given.

    ``stats`` (e.g. ``Engine.stats``) receives the observation-truncation
    count under ``"gba_obs_dropped"`` — no silent caps (SURVEY.md §5).
    """
    prob, n_dropped = build_global_problem(m, cfg)
    if stats is not None:
        stats["gba_obs_dropped"] = stats.get("gba_obs_dropped", 0) + int(
            n_dropped
        )
    if mesh is not None:
        prob = shard_problem(prob, mesh)
    if prob.cam_slots.shape[0] > DENSE_SCHUR_MAX_CAMS:
        from .schur_pcg import solve_ba_pcg

        R, t, xyz, _ = solve_ba_pcg(
            prob, cfg, iters=iters, chi2_th=cfg.chi2_mono,
            chunk=mesh is None,
        )
    else:
        # never route a mesh-sharded problem into the Pallas kernel: its
        # pallas_call sees landmark-sharded operands without a shard_map
        # (ADVICE r4 medium) — force the einsum path, whose scatter into the
        # replicated camera system XLA turns into the ICI all-reduce
        R, t, xyz, _ = solve_ba(
            prob,
            cfg,
            iters=iters,
            chi2_th=cfg.chi2_mono,
            use_kernel=False if mesh is not None else None,
        )
    if mesh is not None:
        # bring results back to the map's device so the engine's map state
        # never inherits a multi-device sharding from a loop-closure GBA
        dev = jax.devices()[0]
        prob = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), prob)
        R, t, xyz = jax.device_put((R, t, xyz), dev)
    return write_back(m, prob, R, t, xyz, cfg, chi2_th=cfg.chi2_mono)
