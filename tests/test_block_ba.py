"""Keyframe-block-partitioned BA (SURVEY.md §2.3 map-block partitioning).

A perturbed synthetic corridor at 64 keyframes is refined by
block-coordinate BA with 8 keyframe blocks; the test asserts real
convergence (pose error shrinks by an order of magnitude), disjoint
ownership (write-back touches every live keyframe exactly once), and
1-device vs 8-device-mesh parity — the block axis is the sharded axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dialog_tpu import geometry as geo
from dialog_tpu.config import EngineConfig
from dialog_tpu.containers import empty_map, recount_lm_obs
from dialog_tpu.distributed import make_mesh
from dialog_tpu.optim.block_ba import (
    block_bundle_adjustment,
    build_block_problems,
)

CFG = EngineConfig(
    # F must cover the full covisibility window (N_OBSERVERS * LM_PER_KF)
    # or landmarks end up under-observed and the problem ill-conditioned
    max_features=192, max_keyframes=96, max_landmarks=4096,
    max_obs_per_lm=6,
)
N_KF = 64
LM_PER_KF = 40
N_OBSERVERS = 4
STEP = 0.6


def corridor_map(seed=0, perturb=0.05, block_local=False, n_blocks=8):
    """Forward-motion corridor with banded covisibility + known ground truth.

    ``block_local=True`` perturbs only block-INTERIOR keyframes (boundary
    bands stay at ground truth) — the error class block-partitioned BA is
    built for: residual local noise after the pose graph has handled the
    globally-correlated modes (the reference's essential-graph/GBA split).
    """
    rng = np.random.default_rng(seed)
    K, F, L = CFG.max_keyframes, CFG.max_features, CFG.max_landmarks
    n_lm = N_KF * LM_PER_KF
    created_by = np.repeat(np.arange(N_KF), LM_PER_KF)
    xyz = np.zeros((n_lm, 3), np.float32)
    xyz[:, 0] = rng.uniform(-6, 6, n_lm)
    xyz[:, 1] = rng.uniform(-3, 3, n_lm)
    xyz[:, 2] = created_by * STEP + rng.uniform(5, 12, n_lm)
    t_gt = np.zeros((N_KF, 3), np.float32)
    t_gt[:, 2] = -np.arange(N_KF) * STEP

    obs_lm = np.full((K, F), -1, np.int32)
    uv = np.zeros((K, F, 2), np.float32)
    feat_valid = np.zeros((K, F), bool)
    for k in range(N_KF):
        lo = max(0, k - (N_OBSERVERS - 1)) * LM_PER_KF
        hi = (k + 1) * LM_PER_KF
        ids = rng.permutation(np.arange(lo, hi))[:F]
        Xc = xyz[ids] + t_gt[k]
        z = Xc[:, 2]
        u = CFG.fx * Xc[:, 0] / z + CFG.cx + rng.normal(0, 0.3, len(ids))
        v = CFG.fy * Xc[:, 1] / z + CFG.cy + rng.normal(0, 0.3, len(ids))
        ok = (z > 0.5) & (u >= 0) & (u < CFG.width) & (v >= 0) & (v < CFG.height)
        n = len(ids)
        obs_lm[k, :n] = np.where(ok, ids, -1)
        uv[k, :n, 0] = u
        uv[k, :n, 1] = v
        feat_valid[k, :n] = ok

    m = empty_map(CFG)
    # perturb everything except the two gauge keyframes. BOUNDED local
    # noise (direct rotation + translation jitter): block-coordinate BA is
    # the local-refinement stage — unbounded chain-correlated drift is the
    # pose graph's job (the reference's essential-graph/GBA split).
    t0 = t_gt.copy()
    R0 = np.tile(np.eye(3, dtype=np.float32), (N_KF, 1, 1))
    blk = N_KF // n_blocks
    for k in range(2, N_KF):
        # boundary bands stay at ground truth: the trailing band's creators
        # are the next block's frozen anchor landmarks, the leading band's
        # cameras are the previous block's frozen observer cameras
        if block_local and (k % blk >= blk - 3 or k % blk < 3):
            continue
        phi = rng.normal(0, perturb * 0.2, 3).astype(np.float32)
        rho = rng.normal(0, perturb, 3).astype(np.float32)
        dR = np.asarray(geo.so3_exp(jnp.asarray(phi)))
        # left-multiplicative: rotates attitude about the camera CENTER
        # (R alone would swing the center by |phi|*|t|, growing down the
        # corridor) and shifts the center by ~|rho|
        R0[k] = dR @ R0[k]
        t0[k] = dR @ t0[k] + rho
    lm_noise = rng.normal(0, 2 * perturb, xyz.shape).astype(np.float32)
    if block_local:
        # landmarks created by boundary-band keyframes stay at ground truth
        # too (they are the frozen anchors of the neighboring block)
        boundary_creator = (created_by % blk) >= blk - 3
        lm_noise[boundary_creator] = 0.0
    xyz0 = xyz + lm_noise

    kfs = m.kfs._replace(
        R=m.kfs.R.at[:N_KF].set(jnp.asarray(R0)),
        t=m.kfs.t.at[:N_KF].set(jnp.asarray(t0)),
        uv=jnp.asarray(uv),
        feat_valid=jnp.asarray(feat_valid),
        obs_lm=jnp.asarray(obs_lm),
        valid=m.kfs.valid.at[:N_KF].set(True),
        seq=m.kfs.seq.at[:N_KF].set(jnp.arange(N_KF, dtype=jnp.int32)),
        parent=m.kfs.parent.at[1:N_KF].set(
            jnp.arange(N_KF - 1, dtype=jnp.int32)
        ),
    )
    lms = m.lms._replace(
        xyz=m.lms.xyz.at[:n_lm].set(jnp.asarray(xyz0)),
        ref_kf=m.lms.ref_kf.at[:n_lm].set(jnp.asarray(created_by, np.int32)),
        first_seq=m.lms.first_seq.at[:n_lm].set(
            jnp.asarray(created_by, np.int32)
        ),
        valid=m.lms.valid.at[:n_lm].set(True),
    )
    m = recount_lm_obs(m._replace(kfs=kfs, lms=lms))
    return m, np.asarray(t_gt), xyz


def _pose_err(m, t_gt):
    """Mean camera-CENTER error (t_cw differences conflate attitude)."""
    R = np.asarray(m.kfs.R[:N_KF])
    t = np.asarray(m.kfs.t[:N_KF])
    C = -np.einsum("kij,ki->kj", R, t)
    C_gt = -t_gt    # ground-truth rotation is identity
    return float(np.linalg.norm(C - C_gt, axis=1).mean())


class TestBlockBA:
    def test_blocks_partition_and_own_disjointly(self):
        m, *_ = corridor_map()
        probs, cam_own, dropped = build_block_problems(m, CFG, 8, cams_pb=24, lms_pb=512)
        lm_ids = np.asarray(probs.lm_ids)
        lm_opt = np.asarray(probs.lm_opt)
        owned = lm_ids[lm_opt & (lm_ids < CFG.max_landmarks)]
        assert len(owned) == len(np.unique(owned)) == N_KF * LM_PER_KF
        # every block's OWNED cameras are owned by that block alone
        opt_slots = np.asarray(
            jnp.where(probs.cam_opt & cam_own, probs.cam_slots,
                      CFG.max_keyframes)
        )
        flat = opt_slots[opt_slots < CFG.max_keyframes]
        assert len(flat) == len(np.unique(flat)) == N_KF - 2  # gauge frozen

    def test_fixes_block_local_error(self):
        """The designed error class (local noise, boundaries near-correct):
        a couple of rounds must remove most of it."""
        m, t_gt, _ = corridor_map(block_local=True, n_blocks=4)
        err0 = _pose_err(m, t_gt)
        m2 = block_bundle_adjustment(
            m, CFG, n_blocks=4, rounds=2, iters=8, cams_pb=32, lms_pb=1024
        )
        err1 = _pose_err(m2, t_gt)
        assert err1 < err0 / 2.5, (err0, err1)

    def test_monotone_on_global_noise(self):
        """On globally-distributed noise the method must not diverge (the
        failure mode of naive block-Jacobi) — monotone, if slow; the joint
        solvers own this regime."""
        m, t_gt, _ = corridor_map()
        err0 = _pose_err(m, t_gt)
        m2 = block_bundle_adjustment(
            m, CFG, n_blocks=8, rounds=2, iters=6, cams_pb=24, lms_pb=512
        )
        err1 = _pose_err(m2, t_gt)
        assert err1 < err0 * 1.02, (err0, err1)

    def test_mesh_sharded_matches_single_device(self):
        m, t_gt, _ = corridor_map(seed=1)
        mesh = make_mesh()
        assert np.prod(mesh.devices.shape) == 8
        m1 = block_bundle_adjustment(
            m, CFG, n_blocks=8, rounds=2, iters=4, cams_pb=24, lms_pb=512
        )
        m8 = block_bundle_adjustment(
            m, CFG, n_blocks=8, rounds=2, iters=4, cams_pb=24, lms_pb=512,
            mesh=mesh,
        )
        np.testing.assert_allclose(
            np.asarray(m1.kfs.t[:N_KF]), np.asarray(m8.kfs.t[:N_KF]), atol=5e-4
        )
        lv = np.asarray(m1.lms.valid)
        np.testing.assert_allclose(
            np.asarray(m1.lms.xyz)[lv], np.asarray(m8.lms.xyz)[lv], atol=5e-3
        )


class TestEngineBlockRefine:
    def test_engine_facade(self):
        from dialog_tpu.system import Engine

        m, t_gt, _ = corridor_map(block_local=True, n_blocks=4)
        eng = Engine(CFG)
        eng.m = m
        eng.kf_count = N_KF
        eng.ref_kf = N_KF - 1
        err0 = _pose_err(eng.m, t_gt)
        eng.block_refine(n_blocks=4, rounds=2, iters=8, cams_pb=32, lms_pb=1024)
        err1 = _pose_err(eng.m, t_gt)
        assert err1 < err0 / 2.5, (err0, err1)
        # tracking anchors re-based on the refined map
        np.testing.assert_allclose(
            eng._last_t, np.asarray(eng.m.kfs.t[eng.ref_kf]), atol=1e-6
        )


class TestOrphanedLandmarks:
    def test_culled_ref_kf_landmarks_stay_in_problem(self):
        """A landmark whose reference keyframe was culled must re-anchor to
        an observing keyframe's block, not silently drop from every block."""
        m, t_gt, _ = corridor_map()
        # cull keyframe 10 without re-anchoring its landmarks (what
        # cull_keyframes does to lms.ref_kf)
        m = m._replace(
            kfs=m.kfs._replace(valid=m.kfs.valid.at[10].set(False))
        )
        probs, cam_own, dropped = build_block_problems(
            m, CFG, 8, cams_pb=24, lms_pb=512
        )
        lm_ids = np.asarray(probs.lm_ids)
        lm_opt = np.asarray(probs.lm_opt)
        owned = set(lm_ids[lm_opt & (lm_ids < CFG.max_landmarks)].tolist())
        # keyframe 10's landmarks that still have LIVE observers (11..13)
        # must remain owned by some block; ones visible only from the
        # culled keyframe are correctly gone
        obs = np.asarray(m.kfs.obs_lm)
        fv = np.asarray(m.kfs.feat_valid)
        kv = np.asarray(m.kfs.valid)
        orphan_ids = {
            lm
            for lm in range(10 * LM_PER_KF, 11 * LM_PER_KF)
            if any(kv[k] and ((obs[k] == lm) & fv[k]).any() for k in range(96))
        }
        assert orphan_ids, "fixture produced no observed orphans"
        assert orphan_ids <= owned, sorted(orphan_ids - owned)[:5]
