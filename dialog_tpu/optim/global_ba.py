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
def build_global_problem(m: MapState, cfg: EngineConfig) -> BAProblem:
    """All valid keyframes + all valid landmarks as one BAProblem.

    Camera index == keyframe slot (C = max_keyframes). The first two
    keyframes are frozen as the gauge/scale anchor (reference fixes KF0;
    monocular needs a second anchor for scale).
    """
    K, F = m.kfs.obs_lm.shape
    L = m.lms.xyz.shape[0]
    O = cfg.max_obs_per_lm

    cam_slots = jnp.arange(K, dtype=jnp.int32)
    cam_opt = m.kfs.valid & (cam_slots >= 2)

    rows_ok = m.kfs.valid[:, None] & m.kfs.feat_valid & (m.kfs.obs_lm >= 0)
    safe = jnp.clip(m.kfs.obs_lm, 0, L - 1)
    li_flat = jnp.where(rows_ok & m.lms.valid[safe], safe, L).reshape(-1)
    order = jnp.argsort(li_flat)
    sorted_li = li_flat[order]
    first = jnp.searchsorted(sorted_li, sorted_li, side="left")
    rank = jnp.arange(sorted_li.shape[0]) - first
    keep = (sorted_li < L) & (rank < O)
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
    obs_w = cfg.scale_factor ** (-2.0 * obs_oct.astype(jnp.float32))
    obs_w = jnp.where(obs_ok, obs_w, 0.0)

    return BAProblem(
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
    )


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
    )


# camera count above which the dense reduced system is replaced by the
# matrix-free Schur PCG (schur_pcg.solve_ba_pcg): forming S costs
# O((6C)^2 3P) flops and (6C)^2 memory — at the KITTI00 preset's C=2048
# that is minutes per LM iteration, vs milliseconds for the implicit solve
DENSE_SCHUR_MAX_CAMS = 192


def global_bundle_adjustment(
    m: MapState,
    cfg: EngineConfig,
    iters: int = 20,
    mesh: Mesh | None = None,
) -> MapState:
    """Full-map BA; landmark-sharded over `mesh` when given."""
    prob = build_global_problem(m, cfg)
    if mesh is not None:
        prob = shard_problem(prob, mesh)
    if prob.cam_slots.shape[0] > DENSE_SCHUR_MAX_CAMS:
        from .schur_pcg import solve_ba_pcg

        R, t, xyz, _ = solve_ba_pcg(prob, cfg, iters=iters, chi2_th=cfg.chi2_mono)
    else:
        R, t, xyz, _ = solve_ba(prob, cfg, iters=iters, chi2_th=cfg.chi2_mono)
    if mesh is not None:
        # bring results back to the map's device so the engine's map state
        # never inherits a multi-device sharding from a loop-closure GBA
        dev = jax.devices()[0]
        prob = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), prob)
        R, t, xyz = jax.device_put((R, t, xyz), dev)
    return write_back(m, prob, R, t, xyz, cfg, chi2_th=cfg.chi2_mono)
