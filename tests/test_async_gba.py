"""Asynchronous loop-closure GBA (VERDICT r4 directive 3).

The reference runs ``GlobalBundleAdjustemnt`` on a transient thread spawned
by ``LoopClosing::CorrectLoop`` and merges the result via spanning-tree
propagation for keyframes/points created meanwhile
(``LoopClosing::RunGlobalBundleAdjustment``). The TPU build chunks the solve
into one LM iteration per tracked batch and merges with
``fold_gba_result``. These tests pin:

* the fold's re-anchoring algebra (a pure gauge transform must propagate
  exactly to keyframes and landmarks created after the snapshot, and
  recycled slots must be treated as new entities),
* engine-level equivalence: the async path closes the same loop-orbit
  sequence within the same ATE gate as the synchronous path, while actually
  running chunked (gba_runs stat).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dialog_tpu import geometry as geo
from dialog_tpu.config import EngineConfig
from dialog_tpu.containers import empty_map
from dialog_tpu.datasets import synth
from dialog_tpu.eval.ate import ate_rmse
from dialog_tpu.optim.global_ba import GBASnapshot, fold_gba_result
from dialog_tpu.system import Engine, OK


def _rand_pose(rng):
    phi = rng.normal(size=3).astype(np.float32) * 0.4
    R = np.asarray(geo.so3_exp(jnp.asarray(phi)))
    t = rng.normal(size=3).astype(np.float32)
    return R, t


def _compose(Ra, ta, Rb, tb):
    """T_a o T_b."""
    return Ra @ Rb, Ra @ tb + ta


def _inv(R, t):
    return R.T, -R.T @ t


class TestFoldGBA:
    def _base_map(self):
        cfg = EngineConfig(
            max_features=32, max_keyframes=8, max_landmarks=16,
            max_local_lms=16, max_obs_per_lm=4,
        )
        m = empty_map(cfg)
        rng = np.random.default_rng(0)
        poses = [_rand_pose(rng) for _ in range(4)]
        kfs = m.kfs._replace(
            valid=jnp.asarray([True, True, True, False, False, False, False, False]),
            seq=jnp.asarray([0, 1, 2, -1, -1, -1, -1, -1], jnp.int32),
            parent=jnp.asarray([-1, 0, 1, -1, -1, -1, -1, -1], jnp.int32),
            R=m.kfs.R.at[:4].set(jnp.asarray(np.stack([p[0] for p in poses]))),
            t=m.kfs.t.at[:4].set(jnp.asarray(np.stack([p[1] for p in poses]))),
        )
        X = rng.normal(size=(2, 3)).astype(np.float32) + np.array([0, 0, 8], np.float32)
        lms = m.lms._replace(
            valid=m.lms.valid.at[:2].set(True),
            first_seq=m.lms.first_seq.at[:2].set(jnp.asarray([0, 1])),
            ref_kf=m.lms.ref_kf.at[:2].set(jnp.asarray([0, 1])),
            xyz=m.lms.xyz.at[:2].set(jnp.asarray(X)),
        )
        return cfg, m._replace(kfs=kfs, lms=lms), poses, X, rng

    def test_gauge_transform_propagates_to_new_entities(self):
        cfg, m0, poses, X, rng = self._base_map()
        snap = GBASnapshot(m0)

        # "optimized" result = snapshot poses under a pure gauge change G:
        # T_opt = T_cur o G^-1, X_opt = G(X)
        Rg, tg = _rand_pose(rng)
        Rgi, tgi = _inv(Rg, tg)
        K, L = 8, 16
        R_opt = np.asarray(m0.kfs.R).copy()
        t_opt = np.asarray(m0.kfs.t).copy()
        for k in range(3):
            R_opt[k], t_opt[k] = _compose(
                np.asarray(m0.kfs.R[k]), np.asarray(m0.kfs.t[k]), Rgi, tgi
            )
        xyz_opt = np.asarray(m0.lms.xyz).copy()
        xyz_opt[:2] = (Rg @ X.T).T + tg

        # live map evolved after the snapshot: KF3 (seq 3, parent=2) and a
        # landmark anchored at it
        R3, t3 = _rand_pose(rng)
        X2 = np.array([0.5, -0.3, 9.0], np.float32)
        kfs = m0.kfs._replace(
            valid=m0.kfs.valid.at[3].set(True),
            seq=m0.kfs.seq.at[3].set(3),
            parent=m0.kfs.parent.at[3].set(2),
            R=m0.kfs.R.at[3].set(jnp.asarray(R3)),
            t=m0.kfs.t.at[3].set(jnp.asarray(t3)),
        )
        lms = m0.lms._replace(
            valid=m0.lms.valid.at[2].set(True),
            first_seq=m0.lms.first_seq.at[2].set(3),
            ref_kf=m0.lms.ref_kf.at[2].set(3),
            xyz=m0.lms.xyz.at[2].set(jnp.asarray(X2)),
        )
        m = m0._replace(kfs=kfs, lms=lms)

        out = fold_gba_result(
            m, snap.kf_seq, snap.kf_valid, snap.lm_valid,
            snap.lm_first_seq, snap.lm_ref,
            jnp.asarray(R_opt), jnp.asarray(t_opt), jnp.asarray(xyz_opt),
        )
        # snapshot keyframes take the optimized pose outright
        np.testing.assert_allclose(np.asarray(out.kfs.R[:3]), R_opt[:3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.kfs.t[:3]), t_opt[:3], atol=1e-5)
        # the new keyframe must follow the same gauge change: T3 o G^-1
        R3n, t3n = _compose(R3, t3, Rgi, tgi)
        np.testing.assert_allclose(np.asarray(out.kfs.R[3]), R3n, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.kfs.t[3]), t3n, atol=1e-4)
        # snapshot landmarks take xyz_opt; the new landmark follows G
        np.testing.assert_allclose(np.asarray(out.lms.xyz[:2]), xyz_opt[:2], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.lms.xyz[2]), Rg @ X2 + tg, atol=1e-4
        )

    def test_recycled_slot_treated_as_new(self):
        cfg, m0, poses, X, rng = self._base_map()
        snap = GBASnapshot(m0)
        Rg, tg = _rand_pose(rng)
        Rgi, tgi = _inv(Rg, tg)
        R_opt = np.asarray(m0.kfs.R).copy()
        t_opt = np.asarray(m0.kfs.t).copy()
        for k in range(3):
            R_opt[k], t_opt[k] = _compose(
                np.asarray(m0.kfs.R[k]), np.asarray(m0.kfs.t[k]), Rgi, tgi
            )
        # slot 1 was culled and RECYCLED during the GBA window: new seq,
        # parent = 2. It must NOT take slot 1's optimized pose; it must be
        # re-anchored through its parent.
        Rr, tr = _rand_pose(rng)
        kfs = m0.kfs._replace(
            seq=m0.kfs.seq.at[1].set(7),
            parent=m0.kfs.parent.at[1].set(2),
            R=m0.kfs.R.at[1].set(jnp.asarray(Rr)),
            t=m0.kfs.t.at[1].set(jnp.asarray(tr)),
        )
        m = m0._replace(kfs=kfs)
        out = fold_gba_result(
            m, snap.kf_seq, snap.kf_valid, snap.lm_valid,
            snap.lm_first_seq, snap.lm_ref,
            jnp.asarray(R_opt), jnp.asarray(t_opt), jnp.asarray(np.asarray(m0.lms.xyz)),
        )
        Rn, tn = _compose(Rr, tr, Rgi, tgi)
        np.testing.assert_allclose(np.asarray(out.kfs.R[1]), Rn, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.kfs.t[1]), tn, atol=1e-4)


CFG = EngineConfig(
    max_features=512,
    max_keyframes=96,
    max_landmarks=16384,
    max_local_lms=4096,
    max_frames_between_kf=6,
    vocab_words=512,
    vocab_min_kfs=5,
)
N_FRAMES = 260
PERIOD = 200


def _run_orbit(gba_async: bool):
    scene = synth.make_scene(
        seed=7, n_points=8000, n_frames=N_FRAMES, trajectory="loop", cfg=CFG,
        period=PERIOD,
    )
    eng = Engine(CFG)
    eng.gba_async = gba_async
    for i in range(N_FRAMES):
        fr, _ = synth.observe(scene, i, noise_px=0.5, desc_flips=6)
        eng.track_features(fr, float(i) / 30.0)
    eng.flush()
    return scene, eng


@pytest.mark.soak
class TestAsyncGBAEngine:
    def test_async_closes_loop_within_gate(self):
        scene, eng = _run_orbit(gba_async=True)
        assert len(eng._loop.closed_loops) >= 1, "no loop closure fired"
        assert eng.stats["gba_runs"] >= 1, "async GBA never started"
        assert eng._gba is None, "GBA not drained by flush"
        states = [r.state for r in eng.trajectory]
        first_ok = states.index(OK)
        idx = [i for i in range(first_ok, N_FRAMES) if states[i] == OK]
        est = eng.positions[idx]
        gt = np.stack([-scene.R[i].T @ scene.t[i] for i in idx])
        err = ate_rmse(est, gt, with_scale=True)
        span = np.linalg.norm(gt.max(0) - gt.min(0))
        assert err < 0.05 * span, (err, span)
