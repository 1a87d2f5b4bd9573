"""Keyframe-block-partitioned bundle adjustment (large-scale SfM axis).

SURVEY.md §2.3 "Keyframe/map-block partitioning (1k+ KF SfM)": the global
problem is split into B blocks of keyframes (contiguous by insertion
number — forward motion makes these covisibility-coherent, like map
submaps). Each block's BA problem contains:

* variables: the block's keyframes + the landmarks whose reference
  keyframe lies in the block (every landmark is OWNED by exactly one
  block, so write-back never conflicts);
* frozen context: other blocks' keyframes that observe owned landmarks
  enter with ``cam_opt = False``, and landmarks owned by other blocks but
  observed by owned cameras enter with ``lm_opt = False`` (their
  observations become exact pose-only edges). Both directions of coupling
  must be present or a block's step ignores part of the joint objective
  and the iteration is not coordinate descent (measured: blocks drift by
  tens of metres without the frozen boundary landmarks).

All B problems are independent given the frozen boundary, so they solve
as ONE batched ``vmap(solve_ba)`` whose block axis shards over the device
mesh — each chip optimizes its own map blocks. Updates alternate red-black
(simultaneous neighbor updates oscillate; letting boundary cameras move
per-block — restricted Schwarz — oscillates too).

Convergence honesty: each half-step is exact block-coordinate descent on
the joint robust cost, so it is monotone — but information crosses one
block boundary per half-step, so globally-correlated error relaxes at
O(1/n_blocks^2) per round. This stage is the PARALLEL LOCAL REFINEMENT of
the map; long-wavelength modes belong to the device-resident pose graph
(optim/pose_graph.py), mirroring the reference's essential-graph-then-GBA
split. tests/test_block_ba.py pins both regimes.

This complements the landmark-sharded global PCG (optim/global_ba.py):
that shards one JOINT solve's reduction; this partitions the PROBLEM, at
the cost of block-coordinate convergence — the right trade when the map no
longer fits one problem extraction, the canonical 1k+ keyframe regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..containers import MapState
from .local_ba import BAProblem, solve_ba


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "cams_pb", "lms_pb"))
def build_block_problems(
    m: MapState,
    cfg: EngineConfig,
    n_blocks: int,
    cams_pb: int,        # camera capacity per block (owned + frozen boundary)
    lms_pb: int,         # owned-landmark capacity per block
):
    """Batched BAProblem with a leading block axis [B, ...].

    Keyframes rank by insertion number (seq) and split into B contiguous
    blocks; landmark ownership follows the reference keyframe's block.
    Returns ``(probs, cam_own [B, C], n_dropped)`` — cam_own marks which of
    each block's cameras it owns (write-back targets); n_dropped counts
    observations lost to the per-landmark O cap plus landmarks beyond
    ``lms_pb`` (surfaced, not silent: SURVEY.md §5).
    """
    K, F = m.kfs.obs_lm.shape
    L = m.lms.xyz.shape[0]
    O = cfg.max_obs_per_lm

    # rank keyframes by seq; invalid sort last
    seq_key = jnp.where(m.kfs.valid, m.kfs.seq, jnp.int32(2**30))
    order = jnp.argsort(seq_key)
    rank_of = jnp.zeros((K,), jnp.int32).at[order].set(
        jnp.arange(K, dtype=jnp.int32)
    )
    n_live = jnp.sum(m.kfs.valid)
    blk_size = jnp.maximum((n_live + n_blocks - 1) // n_blocks, 1)
    kf_block = jnp.where(
        m.kfs.valid, jnp.minimum(rank_of // blk_size, n_blocks - 1), -1
    )                                                    # i32[K]

    # landmark ownership = reference keyframe's block; landmarks whose
    # reference keyframe was culled (kf_block = -1) re-anchor to the lowest
    # block among their live observers — otherwise they would silently drop
    # out of every block's objective (neither owned nor boundary)
    lm_ref = jnp.clip(m.lms.ref_kf, 0, K - 1)
    ref_blk = jnp.where(
        m.lms.valid & (m.lms.ref_kf >= 0), kf_block[lm_ref], -1
    )                                                    # i32[L]
    obs_all_ok = m.kfs.feat_valid & (m.kfs.obs_lm >= 0) & m.kfs.valid[:, None]
    blk_of_row = jnp.where(
        (kf_block >= 0)[:, None] & obs_all_ok, kf_block[:, None], n_blocks
    )                                                    # i32[K, F]
    obs_tgt = jnp.where(obs_all_ok, m.kfs.obs_lm, L).reshape(-1)
    lm_obs_blk = (
        jnp.full((L + 1,), n_blocks, jnp.int32)
        .at[obs_tgt]
        .min(blk_of_row.reshape(-1))
    )[:L]
    lm_block = jnp.where(
        ref_blk >= 0,
        ref_blk,
        jnp.where(m.lms.valid & (lm_obs_blk < n_blocks), lm_obs_blk, -1),
    )

    def build_one(b):
        owned_kf = kf_block == b                          # bool[K]
        owned_lm = lm_block == b                          # bool[L]

        # owned-landmark list (variables; capacity lms_pb)
        own_ids, = jnp.nonzero(owned_lm, size=lms_pb, fill_value=L)
        n_lm_over = jnp.maximum(jnp.sum(owned_lm) - lms_pb, 0)

        # boundary landmarks: observed by OWNED cameras but owned elsewhere.
        # They enter FROZEN (lm_opt False), so those observations act as
        # pose-only edges — without them a block's camera moves ignore part
        # of the joint objective and block-coordinate descent is no longer
        # monotone (measured: blocks drift instead of converging).
        owned_rows = owned_kf[:, None] & m.kfs.feat_valid & (m.kfs.obs_lm >= 0)
        seen = jnp.zeros((L + 1,), bool).at[
            jnp.where(owned_rows, m.kfs.obs_lm, L)
        ].set(True, mode="drop")[:L]
        bnd_lm = seen & m.lms.valid & ~owned_lm & (lm_block >= 0)
        bnd_ids, = jnp.nonzero(bnd_lm, size=lms_pb, fill_value=L)
        n_lm_over = n_lm_over + jnp.maximum(jnp.sum(bnd_lm) - lms_pb, 0)

        lm_ids = jnp.concatenate([own_ids, bnd_ids]).astype(jnp.int32)
        lm_opt = jnp.concatenate(
            [own_ids < L, jnp.zeros((lms_pb,), bool)]
        )
        P2 = 2 * lms_pb

        # boundary CAMERAS are those anchoring OWNED landmarks: other
        # blocks' keyframes observing this block's landmarks
        in_own = jnp.zeros((L + 1,), bool).at[own_ids].set(
            own_ids < L, mode="drop"
        )[:L]
        sel = in_own[jnp.clip(m.kfs.obs_lm, 0, L - 1)] & (
            m.kfs.obs_lm >= 0
        ) & m.kfs.feat_valid
        touches = jnp.sum(sel, axis=1)                    # i32[K]
        is_owner = owned_kf & m.kfs.valid
        is_boundary = ~owned_kf & m.kfs.valid & (touches > 0)
        # priority: owners (by rank), then boundary by touch count
        prio = jnp.where(
            is_owner, jnp.int32(2**20) + touches,
            jnp.where(is_boundary, touches, 0),
        )
        top_p, cam_slots = jax.lax.top_k(prio, cams_pb)
        cam_valid = top_p > 0
        cam_slots = jnp.where(cam_valid, cam_slots, K).astype(jnp.int32)
        safe_slot = jnp.clip(cam_slots, 0, K - 1)
        # gauge: boundary cameras are frozen context (letting them move
        # per-block — restricted additive Schwarz — was measured to
        # oscillate between adjacent blocks); the two globally-oldest
        # keyframes stay frozen everywhere
        cam_opt = cam_valid & is_owner[safe_slot] & (rank_of[safe_slot] >= 2)

        # observation bucketing: shared rank-by-presence core (local_ba)
        from .local_ba import bucket_observations, dedupe_row_landmarks

        inv = jnp.full((L + 1,), P2, jnp.int32).at[lm_ids].set(
            jnp.arange(P2, dtype=jnp.int32), mode="drop"
        )
        rows = m.kfs.obs_lm[safe_slot]                    # [C, F]
        rows_ok = (
            cam_valid[:, None]
            & m.kfs.feat_valid[safe_slot]
            & (rows >= 0)
        )
        li = jnp.where(rows_ok, inv[jnp.clip(rows, 0, L - 1)], P2)
        li = dedupe_row_landmarks(li, P2)
        # an observation whose camera AND landmark are both frozen
        # contributes nothing — drop it instead of burning an O slot
        both_frozen = (~cam_opt)[:, None] & ~lm_opt[jnp.clip(li, 0, P2 - 1)]
        li = jnp.where(both_frozen & (li < P2), P2, li)
        C = cams_pb
        obs_cam, obs_feat, obs_ok, n_obs_over = bucket_observations(li, P2, O)
        safe_cam = jnp.clip(obs_cam, 0, C - 1)
        obs_uv = m.kfs.uv[safe_slot][safe_cam, obs_feat]
        obs_oct = m.kfs.octave[safe_slot][safe_cam, obs_feat]
        obs_w = cfg.scale_factor ** (-2.0 * obs_oct.astype(jnp.float32))
        obs_w = jnp.where(obs_ok, obs_w, 0.0)
        if cfg.bf > 0:
            obs_ur = jnp.where(
                obs_ok, m.kfs.u_right[safe_slot][safe_cam, obs_feat], -1.0
            )
        else:
            obs_ur = None
        prob = BAProblem(
            cam_slots=cam_slots,
            cam_opt=cam_opt,
            R=m.kfs.R[safe_slot],
            t=m.kfs.t[safe_slot],
            lm_ids=lm_ids,
            xyz=m.lms.xyz[jnp.clip(lm_ids, 0, L - 1)],
            obs_cam=obs_cam,
            obs_uv=obs_uv,
            obs_w=obs_w,
            obs_ok=obs_ok,
            obs_feat=obs_feat,
            obs_ur=obs_ur,
            lm_opt=lm_opt,
        )
        cam_own = cam_valid & is_owner[safe_slot]
        return prob, cam_own, n_lm_over + n_obs_over

    probs, cam_own, dropped = jax.vmap(build_one)(
        jnp.arange(n_blocks, dtype=jnp.int32)
    )
    return probs, cam_own, jnp.sum(dropped)


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def _solve_blocks(probs, cfg: EngineConfig, iters: int):
    """vmap(solve_ba) over the block axis (einsum path: block problems are
    small and the batched Pallas kernel is not wired for a vmapped axis)."""
    return jax.vmap(
        lambda p: solve_ba(
            p, cfg, iters=iters, chi2_th=cfg.chi2_mono, use_kernel=False
        )
    )(probs)


@functools.partial(jax.jit, static_argnames=("cfg", "parity"))
def _write_back_blocks(
    m: MapState, probs, cam_own, R, t, xyz, cfg: EngineConfig, parity: int = -1
):
    """Fold optimized owned cameras + landmarks into the map.

    Ownership is disjoint by construction, so the scatter order between
    blocks cannot conflict. ``parity`` restricts the fold to even (0) or
    odd (1) blocks — the red-black half-step (-1 = all blocks)."""
    K = m.kfs.valid.shape[0]
    L = m.lms.xyz.shape[0]
    B = probs.cam_slots.shape[0]
    if parity < 0:
        blk_on = jnp.ones((B,), bool)
    else:
        blk_on = (jnp.arange(B) % 2) == parity
    cam_on = probs.cam_opt & cam_own & blk_on[:, None]
    tgt = jnp.where(cam_on, probs.cam_slots, K).reshape(-1)
    kfs = m.kfs._replace(
        R=m.kfs.R.at[tgt].set(R.reshape(-1, 3, 3), mode="drop"),
        t=m.kfs.t.at[tgt].set(t.reshape(-1, 3), mode="drop"),
    )
    lm_on = (probs.lm_ids < L) & probs.lm_opt & blk_on[:, None]
    lm_tgt = jnp.where(lm_on, probs.lm_ids, L).reshape(-1)
    lms = m.lms._replace(
        xyz=m.lms.xyz.at[lm_tgt].set(xyz.reshape(-1, 3), mode="drop")
    )
    return m._replace(kfs=kfs, lms=lms)


def block_bundle_adjustment(
    m: MapState,
    cfg: EngineConfig,
    n_blocks: int = 8,
    rounds: int = 3,
    iters: int = 6,
    cams_pb: int = 64,
    lms_pb: int = 4096,
    mesh: Mesh | None = None,
    stats: dict | None = None,
) -> MapState:
    """Block-coordinate full-map BA, block axis sharded over ``mesh``.

    Each round runs two red-black half-steps: even blocks rebuild against
    the newest boundary poses, solve in parallel, and fold back; then odd
    blocks do the same. With simultaneous (Jacobi) updates, neighboring
    blocks chase each other's stale boundaries and oscillate; the
    alternation is Gauss-Seidel across the chain — and since the
    covisibility band is narrower than a block, non-adjacent same-parity
    blocks are fully independent, so each half-step loses nothing to
    parallelism.
    """
    import math

    for rnd in range(rounds):
        for parity in (0, 1):
            probs, cam_own, dropped = build_block_problems(
                m, cfg, n_blocks, cams_pb, lms_pb
            )
            if stats is not None and parity == 0:
                # once per round — both half-steps rebuild the same caps
                stats["block_ba_obs_dropped"] = stats.get(
                    "block_ba_obs_dropped", 0
                ) + int(dropped)
            # only the active parity's blocks are SOLVED (the inactive half
            # would be solved and discarded — half the dominant cost)
            pp = jax.tree_util.tree_map(
                lambda x: x[parity::2] if x is not None else None, probs
            )
            own_p = cam_own[parity::2]
            n_active = pp.cam_slots.shape[0]
            sub = None
            if mesh is not None and n_active > 1:
                devs = mesh.devices.reshape(-1)
                use = math.gcd(n_active, len(devs))
                if use > 1:
                    sub = Mesh(devs[:use], ("blocks",))
            if sub is not None:
                pp = jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x,
                        NamedSharding(
                            sub, P(*(("blocks",) + (None,) * (x.ndim - 1)))
                        ),
                    ),
                    pp,
                )
            R, t, xyz, _ = _solve_blocks(pp, cfg, iters)
            if sub is not None:
                dev = jax.devices()[0]
                pp = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, dev), pp
                )
                R, t, xyz = jax.device_put((R, t, xyz), dev)
            m = _write_back_blocks(m, pp, own_p, R, t, xyz, cfg, parity=-1)
    return m
