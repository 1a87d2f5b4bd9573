"""Keyframe-slot recycling soak (VERDICT r3 weak #8 / round-2 directive 4).

Drives keyframe allocation past 3x max_keyframes on a tiny-capacity map:
sustained operation requires the standalone capacity cull + the host
freelist (fed by device snapshots) to keep freeing and reusing slots, and
trajectory records anchored to culled keyframes must stay finite via the
cull-time re-anchor chain.
"""

import numpy as np
import pytest

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.system import Engine, OK

pytestmark = pytest.mark.soak

CFG = EngineConfig(
    max_features=512, max_keyframes=12, max_landmarks=4096,
    max_local_lms=1024, max_local_kfs=8, max_fixed_kfs=4,
    max_frames_between_kf=2,     # force a KF attempt every other frame
)


class TestSlotRecyclingSoak:
    def test_sustained_insertion_past_3x_capacity(self):
        n_frames = 120
        scene = synth.make_scene(
            seed=21, n_points=800, n_frames=n_frames, cfg=CFG
        )
        eng = Engine(CFG)
        for i in range(n_frames):
            fr, _ = synth.observe(scene, i, noise_px=0.4)
            eng.track_features(fr, float(i) / 30.0)

        # the done-criterion: total keyframes allocated over the run exceeds
        # 3x the slot capacity, i.e. slots were recycled repeatedly
        assert eng.kf_count >= 3 * CFG.max_keyframes, eng.kf_count
        # tracking survived the whole soak
        states = [r.state for r in eng.trajectory]
        first_ok = states.index(OK)
        assert all(s == OK for s in states[first_ok:])
        # map never exceeds capacity and stays usable
        assert int(np.sum(np.asarray(eng.m.kfs.valid))) <= CFG.max_keyframes
        # capacity events were *observed*, not silent (SURVEY §5 contract)
        assert eng.stats["kf_slot_full"] > 0 or eng.kf_count > CFG.max_keyframes
        # every trajectory record composes to a finite pose (re-anchoring
        # across culled keyframes never leaves a dangling reference)
        for (R, t), rec in zip(eng.final_poses(), eng.trajectory):
            assert np.isfinite(R).all() and np.isfinite(t).all(), rec.frame_id
        # records referencing a keyframe slot must reference a LIVE slot or
        # have been baked to absolute poses
        valid = np.asarray(eng.m.kfs.valid)
        held = np.zeros_like(valid)
        for s in range(CFG.max_keyframes):
            held[s] = valid[s] or s in eng._recent_kf_allocs
        for rec in eng.trajectory:
            if rec.ref_kf >= 0:
                assert held[rec.ref_kf], (rec.frame_id, rec.ref_kf)
