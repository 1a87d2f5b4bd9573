"""KITTI00-preset capacity soak (VERDICT r3 directive 2; BASELINE configs[2]/[4]).

Instantiates the full KITTI00 preset — 2048 keyframe slots, 262k landmark
slots, 2048 features — populates it to >1k live keyframes with a synthetic
corridor map, and drives the per-keyframe pipeline (process_new_keyframe +
local BA) plus one global-BA pass through the matrix-free Schur PCG path at
that occupancy. Proves the capacity-dependent structures ([K,K] covisibility,
[K,F] observation table, [L,O] global problem, chunk-free PCG camera solve)
actually work at the scale the preset declares.
"""

import time

import numpy as np
import pytest
import jax.numpy as jnp

from dialog_tpu.config import KITTI00
from dialog_tpu.containers import FrameArrays, empty_map, recount_lm_obs
from dialog_tpu import mapping
from dialog_tpu.optim.global_ba import (
    DENSE_SCHUR_MAX_CAMS,
    build_global_problem,
    global_bundle_adjustment,
)
from dialog_tpu.optim.local_ba import local_bundle_adjustment

pytestmark = pytest.mark.soak

CFG = KITTI00
N_KF = 1100          # live keyframes (> 1k per the done-criterion)
LM_PER_KF = 125      # landmarks created per keyframe
N_OBSERVERS = 4      # keyframes observing each landmark
STEP = 0.8           # camera advance per keyframe (m)


def build_corridor_map(seed=0, n_kf=N_KF):
    """Directly construct a consistent MapState at KITTI00 occupancy.

    A straight corridor: keyframe k sits at z = k*STEP looking +z; it
    creates LM_PER_KF landmarks 6-14 m ahead and observes the landmarks
    created by keyframes k-3..k (banded covisibility, like forward driving).
    Building through 1k+ engine keyframe insertions would take tens of
    minutes on the CPU mesh; direct construction exercises the same
    capacity-dependent array shapes.
    """
    rng = np.random.default_rng(seed)
    K, F, L = CFG.max_keyframes, CFG.max_features, CFG.max_landmarks
    n_lm = n_kf * LM_PER_KF
    assert n_kf <= K and n_lm <= L

    # landmark geometry: ahead of the creating keyframe
    created_by = np.repeat(np.arange(n_kf), LM_PER_KF)
    xyz = np.zeros((n_lm, 3), np.float32)
    xyz[:, 0] = rng.uniform(-8, 8, n_lm)
    xyz[:, 1] = rng.uniform(-3, 3, n_lm)
    xyz[:, 2] = created_by * STEP + rng.uniform(6, 14, n_lm)
    desc = rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)

    # keyframe poses: identity rotation, camera center at (0, 0, k*STEP)
    # world->cam: X_c = X_w - C
    t_all = np.zeros((n_kf, 3), np.float32)
    t_all[:, 2] = -np.arange(n_kf) * STEP

    m = empty_map(CFG)
    kfs = m.kfs

    # observations: KF k's features 0..(w*LM_PER_KF) map to landmarks
    # created by KFs max(0, k-3)..k
    obs_lm = np.full((K, F), -1, np.int32)
    uv = np.zeros((K, F, 2), np.float32)
    kdesc = np.zeros((K, F, 8), np.uint32)
    feat_valid = np.zeros((K, F), bool)
    u_right = np.full((K, F), -1.0, np.float32)
    depth = np.full((K, F), -1.0, np.float32)
    for k in range(n_kf):
        lo = max(0, k - (N_OBSERVERS - 1)) * LM_PER_KF
        hi = (k + 1) * LM_PER_KF
        ids = np.arange(lo, hi)
        Xc = xyz[ids] + t_all[k]                  # R = I
        z = Xc[:, 2]
        u = CFG.fx * Xc[:, 0] / z + CFG.cx + rng.normal(0, 0.3, len(ids))
        v = CFG.fy * Xc[:, 1] / z + CFG.cy + rng.normal(0, 0.3, len(ids))
        ok = (z > 0.5) & (u >= 0) & (u < CFG.width) & (v >= 0) & (v < CFG.height)
        n = len(ids)
        obs_lm[k, :n] = np.where(ok, ids, -1)
        uv[k, :n, 0] = u
        uv[k, :n, 1] = v
        kdesc[k, :n] = desc[ids]
        feat_valid[k, :n] = ok
        u_right[k, :n] = np.where(ok, u - CFG.bf / np.maximum(z, 0.5), -1.0)
        depth[k, :n] = np.where(ok, z, -1.0)

    kfs = kfs._replace(
        R=kfs.R,                                  # identity everywhere
        t=kfs.t.at[:n_kf].set(jnp.asarray(t_all)),
        uv=jnp.asarray(uv),
        desc=jnp.asarray(kdesc),
        feat_valid=jnp.asarray(feat_valid),
        obs_lm=jnp.asarray(obs_lm),
        valid=kfs.valid.at[:n_kf].set(True),
        frame_id=kfs.frame_id.at[:n_kf].set(jnp.arange(n_kf, dtype=jnp.int32)),
        parent=kfs.parent.at[1:n_kf].set(
            jnp.arange(n_kf - 1, dtype=jnp.int32)
        ),
        seq=kfs.seq.at[:n_kf].set(jnp.arange(n_kf, dtype=jnp.int32)),
    )
    lms = m.lms._replace(
        xyz=m.lms.xyz.at[:n_lm].set(jnp.asarray(xyz)),
        desc=m.lms.desc.at[:n_lm].set(jnp.asarray(desc)),
        normal=m.lms.normal.at[:n_lm].set(
            jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_lm, 1)).astype(np.float32))
        ),
        dmin=m.lms.dmin.at[:n_lm].set(1.0),
        dmax=m.lms.dmax.at[:n_lm].set(50.0),
        ref_kf=m.lms.ref_kf.at[:n_lm].set(jnp.asarray(created_by, dtype=jnp.int32)),
        first_seq=m.lms.first_seq.at[:n_lm].set(
            jnp.asarray(created_by, dtype=jnp.int32)
        ),
        n_visible=m.lms.n_visible.at[:n_lm].set(N_OBSERVERS),
        n_found=m.lms.n_found.at[:n_lm].set(N_OBSERVERS),
        valid=m.lms.valid.at[:n_lm].set(True),
    )
    # banded covisibility: |dk| <= 3 share (4 - |dk|) * LM_PER_KF landmarks
    covis = np.zeros((K, K), np.int32)
    for dk in range(1, N_OBSERVERS):
        w = (N_OBSERVERS - dk) * LM_PER_KF
        i = np.arange(n_kf - dk)
        covis[i, i + dk] = w
        covis[i + dk, i] = w
    m = m._replace(
        kfs=kfs,
        lms=lms,
        covis=jnp.asarray(covis),
        num_kfs=jnp.int32(n_kf),
        num_lms=jnp.int32(n_lm),
    )
    return recount_lm_obs(m)


class TestKittiCapacity:
    def test_capacity_pipeline(self):
        m = build_corridor_map()
        n_valid_before = int(np.asarray(m.kfs.valid).sum())
        assert n_valid_before >= 1000

        # --- per-keyframe pipeline at occupancy --------------------------
        # a new stereo frame one step past the corridor end, re-observing
        # the most recent landmarks (its features 0..500 mirror KF n-1's)
        k_last = N_KF - 1
        frame = FrameArrays(
            uv=m.kfs.uv[k_last],
            uv_raw=m.kfs.uv[k_last],
            response=jnp.where(m.kfs.feat_valid[k_last], 50.0, 0.0),
            octave=m.kfs.octave[k_last],
            angle=m.kfs.angle[k_last],
            desc=m.kfs.desc[k_last],
            valid=m.kfs.feat_valid[k_last],
            u_right=m.kfs.u_right[k_last],
            depth=m.kfs.depth[k_last],
        )
        slot = N_KF                       # first free slot
        t_new = jnp.asarray(
            np.array([0, 0, -(N_KF - 0.5) * STEP], np.float32)
        )
        t0 = time.time()
        m2 = mapping.process_new_keyframe(
            m, frame, jnp.eye(3), t_new,
            m.kfs.obs_lm[k_last],          # track the previous KF's landmarks
            jnp.int32(N_KF), jnp.float32(N_KF / 10.0),
            jnp.int32(slot), jnp.int32(k_last), CFG,
            spawn_depth=True, n_neighbors=CFG.kf_tri_neighbors,
        )
        m2 = local_bundle_adjustment(m2, slot, CFG, iters=3)
        m2.kfs.R.block_until_ready()
        t_kf = time.time() - t0
        assert bool(m2.kfs.valid[slot])
        assert np.isfinite(np.asarray(m2.kfs.t[slot])).all()

        # --- one global-BA pass through the PCG path ---------------------
        prob, _ = build_global_problem(m2, CFG)
        assert prob.cam_slots.shape[0] > DENSE_SCHUR_MAX_CAMS  # PCG selected
        t0 = time.time()
        m3 = global_bundle_adjustment(m2, CFG, iters=1)
        m3.kfs.R.block_until_ready()
        t_gba = time.time() - t0

        valid_kf = np.asarray(m3.kfs.valid)
        valid_lm = np.asarray(m3.lms.valid)
        assert np.isfinite(np.asarray(m3.kfs.R)[valid_kf]).all()
        assert np.isfinite(np.asarray(m3.kfs.t)[valid_kf]).all()
        assert np.isfinite(np.asarray(m3.lms.xyz)[valid_lm]).all()
        # ground truth is self-consistent: poses must stay near the corridor
        t_err = np.abs(
            np.asarray(m3.kfs.t)[: N_KF, 2] + np.arange(N_KF) * STEP
        )
        assert np.median(t_err) < 0.5, np.median(t_err)
        # wall-bounded (generous CPU budget; capacity, not speed, is under test)
        assert t_kf < 600, t_kf
        assert t_gba < 900, t_gba
