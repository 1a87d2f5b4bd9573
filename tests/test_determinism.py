"""Determinism: pure step functions give bitwise-identical results.

SURVEY.md §5 "Race detection": the reference's correctness rests on a
hand-maintained mutex discipline; here the hazard class is removed by
construction, and this test IS the check — same inputs through the full
engine twice must produce byte-identical maps and trajectories.
"""

import numpy as np
import jax

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.system import Engine

CFG = EngineConfig(
    max_features=512, max_keyframes=32, max_landmarks=4096,
    max_local_lms=1024, max_frames_between_kf=6,
)


def _run():
    scene = synth.make_scene(seed=61, n_points=600, n_frames=25, cfg=CFG)
    eng = Engine(CFG)
    for i in range(25):
        fr, _ = synth.observe(scene, i, noise_px=0.4)
        eng.track_features(fr, float(i) / 30.0)
    return eng


class TestDeterminism:
    def test_bitwise_reproducible(self):
        a, b = _run(), _run()
        for la, lb in zip(
            jax.tree_util.tree_leaves(a.m), jax.tree_util.tree_leaves(b.m)
        ):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        for ra, rb in zip(a.trajectory, b.trajectory):
            assert ra.state == rb.state and ra.n_tracked == rb.n_tracked
            np.testing.assert_array_equal(ra.R, rb.R)
            np.testing.assert_array_equal(ra.t, rb.t)
