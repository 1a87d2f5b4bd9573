"""Landmark visibility/found accounting + found-ratio culling.

Reference chain: Tracking::TrackLocalMap calls MapPoint::IncreaseVisible for
frustum-passing local points and IncreaseFound for final inliers;
LocalMapping::MapPointCulling then kills young points whose found/visible
ratio drops below 0.25. Round-3 verdict flagged the counters as write-once
(dead ratio branch); these tests pin the whole chain.
"""

import numpy as np

import jax.numpy as jnp

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.mapping import cull_landmarks
from dialog_tpu.system import Engine


def _cfg():
    return EngineConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        n_features=256, max_features=256,
        max_keyframes=32, max_landmarks=2048, max_local_lms=1024,
        max_local_kfs=8, max_fixed_kfs=4, max_obs_per_lm=8,
        init_min_features=40, init_min_matches=40, init_min_good=25,
    )


def _run_engine(n_frames=24):
    cfg = _cfg()
    scene = synth.make_scene(seed=11, n_points=500, n_frames=n_frames, cfg=cfg)
    eng = Engine(cfg)
    eng.loop_closing_enabled = False
    for i in range(n_frames):
        fr, _ = synth.observe(scene, i, noise_px=0.4)
        eng.track_features(fr, float(i) / 30.0)
    return eng, cfg


class TestVisibilityCounters:
    def test_counters_increment_during_tracking(self):
        eng, _ = _run_engine()
        lms = eng.m.lms
        valid = np.asarray(lms.valid)
        n_vis = np.asarray(lms.n_visible)[valid]
        n_fnd = np.asarray(lms.n_found)[valid]
        # tracking ran for ~24 frames: well-tracked landmarks must have been
        # counted visible AND found many times (creation initializes both
        # to 1 — stuck-at-1 was the round-3 defect)
        assert n_vis.max() > 5, "n_visible never incremented"
        assert n_fnd.max() > 5, "n_found never incremented"
        # found never exceeds visible (found implies frustum-visible)
        assert (n_fnd <= n_vis).all()

    def test_ratio_cull_branch_reachable(self):
        """A young landmark predicted visible many times but almost never
        matched must be culled by the found-ratio rule."""
        eng, cfg = _run_engine()
        m = eng.m
        valid = np.asarray(m.lms.valid)
        lid = int(np.nonzero(valid)[0][0])
        cur = eng.ref_kf
        cur_seq = int(np.asarray(m.kfs.seq[cur]))
        # forge the reference's failing-point profile: young, observed by
        # 3 keyframes (so the under-observation rule does NOT fire), seen
        # 40x, matched once
        lms = m.lms._replace(
            n_visible=m.lms.n_visible.at[lid].set(40),
            n_found=m.lms.n_found.at[lid].set(1),
            n_obs=m.lms.n_obs.at[lid].set(3),
            first_seq=m.lms.first_seq.at[lid].set(cur_seq - 2),
        )
        m2 = cull_landmarks(m._replace(lms=lms), jnp.int32(cur), cfg)
        assert not bool(m2.lms.valid[lid]), "ratio rule did not cull"

    def test_ratio_cull_spares_old_and_good(self):
        eng, cfg = _run_engine()
        m = eng.m
        valid = np.asarray(m.lms.valid)
        good, old = (int(x) for x in np.nonzero(valid)[0][:2])
        cur = eng.ref_kf
        cur_seq = int(np.asarray(m.kfs.seq[cur]))
        lms = m.lms._replace(
            # young but well-found: survives
            n_visible=m.lms.n_visible.at[good].set(40),
            n_found=m.lms.n_found.at[good].set(30),
            n_obs=m.lms.n_obs.at[good].set(3).at[old].set(3),
            first_seq=m.lms.first_seq.at[good]
            .set(cur_seq - 2)
            .at[old]
            .set(cur_seq - 10),
        )
        # old with poor ratio: outside the recent-points window -> spared
        lms = lms._replace(
            n_visible=lms.n_visible.at[old].set(40),
            n_found=lms.n_found.at[old].set(1),
        )
        m2 = cull_landmarks(m._replace(lms=lms), jnp.int32(cur), cfg)
        assert bool(m2.lms.valid[good])
        assert bool(m2.lms.valid[old])


class TestFrustumGates:
    def test_viewing_angle_gate(self):
        """A landmark whose stored normal points away from the camera is
        excluded from the local-map candidate set (Frame::isInFrustum's
        60-degree rule)."""
        from dialog_tpu.tracking import _project_landmarks

        eng, cfg = _run_engine()
        m = eng.m
        valid = np.asarray(m.lms.valid)
        lid = int(np.nonzero(valid)[0][0])
        R = jnp.asarray(eng._last_R)
        t = jnp.asarray(eng._last_t)
        ids = jnp.asarray([lid], jnp.int32)
        _, _, _, _, vis0 = _project_landmarks(m, ids, R, t, cfg, frustum=True)
        # flip the normal: same geometry, reversed viewing direction
        m_flip = m._replace(
            lms=m.lms._replace(normal=-m.lms.normal)
        )
        _, _, _, _, vis1 = _project_landmarks(
            m_flip, ids, R, t, cfg, frustum=True
        )
        if bool(vis0[0]):
            assert not bool(vis1[0]), "angle gate inactive"

    def test_distance_band_gate(self):
        from dialog_tpu.tracking import _project_landmarks

        eng, cfg = _run_engine()
        m = eng.m
        valid = np.asarray(m.lms.valid)
        lid = int(np.nonzero(valid)[0][0])
        R = jnp.asarray(eng._last_R)
        t = jnp.asarray(eng._last_t)
        ids = jnp.asarray([lid], jnp.int32)
        _, _, _, _, vis0 = _project_landmarks(m, ids, R, t, cfg, frustum=True)
        # shrink the band to exclude any distance
        m_band = m._replace(
            lms=m.lms._replace(
                dmax=jnp.full_like(m.lms.dmax, 1e-3),
                dmin=jnp.full_like(m.lms.dmin, 1e-4),
            )
        )
        _, _, _, _, vis1 = _project_landmarks(
            m_band, ids, R, t, cfg, frustum=True
        )
        if bool(vis0[0]):
            assert not bool(vis1[0]), "distance band gate inactive"
