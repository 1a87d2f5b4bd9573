"""Keyframe culling behavior (reference: LocalMapping::KeyFrameCulling)."""

import numpy as np
import pytest
import jax.numpy as jnp

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.system import Engine, OK
from dialog_tpu.mapping import cull_keyframes


CFG = EngineConfig(
    max_features=512, max_keyframes=64, max_landmarks=8192,
    max_local_lms=2048, max_frames_between_kf=3,
)


@pytest.mark.soak
class TestKeyframeCulling:
    def test_redundant_kfs_get_culled_and_tracking_survives(self):
        # a *static-ish* slow sweep creates heavily redundant keyframes
        scene = synth.make_scene(seed=15, n_points=600, n_frames=36, cfg=CFG)
        eng = Engine(CFG)
        for i in range(36):
            fr, _ = synth.observe(scene, i, noise_px=0.4)
            eng.track_features(fr, float(i) / 30.0)
        states = [r.state for r in eng.trajectory]
        assert all(s == OK for s in states[3:])
        n_alive = int(np.sum(np.asarray(eng.m.kfs.valid)))
        # forced-stale policy creates ~12 KFs; culling should have removed some
        assert n_alive < eng.kf_count, (n_alive, eng.kf_count)

    def test_protected_keyframes_survive(self):
        scene = synth.make_scene(seed=16, n_points=500, n_frames=20, cfg=CFG)
        eng = Engine(CFG)
        for i in range(20):
            fr, _ = synth.observe(scene, i, noise_px=0.4)
            eng.track_features(fr, float(i) / 30.0)
        valid = np.asarray(eng.m.kfs.valid)
        # gauge anchors never culled
        assert valid[0] and valid[1]
        # cull is capped at one per keyframe event; map stays usable
        m2 = cull_keyframes(eng.m, jnp.int32(eng.ref_kf), CFG)
        assert int(np.sum(np.asarray(m2.kfs.valid))) >= 2
