"""Loop detection + closure on an orbit sequence (SURVEY.md §7.6)."""

import numpy as np
import pytest

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.eval.ate import ate_rmse
from dialog_tpu.system import Engine, OK

pytestmark = pytest.mark.soak

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


def _run(loop_enabled: bool):
    scene = synth.make_scene(
        seed=7, n_points=8000, n_frames=N_FRAMES, trajectory="loop", cfg=CFG,
        period=PERIOD
    )
    eng = Engine(CFG)
    eng.loop_closing_enabled = loop_enabled
    for i in range(N_FRAMES):
        fr, _ = synth.observe(scene, i, noise_px=0.5, desc_flips=6)
        eng.track_features(fr, float(i) / 30.0)
    return scene, eng


@pytest.fixture(scope="module")
def with_loop():
    return _run(True)


class TestLoopClosing:
    def test_completes_the_orbit(self, with_loop):
        scene, eng = with_loop
        states = [r.state for r in eng.trajectory]
        ok_frac = sum(1 for s in states if s == OK) / len(states)
        assert ok_frac > 0.9, ok_frac

    def test_loop_detected_and_closed(self, with_loop):
        scene, eng = with_loop
        assert len(eng._loop.closed_loops) >= 1, "no loop closure fired"
        cur, cand = eng._loop.closed_loops[0]
        # the loop should connect late keyframes back to early ones
        assert cur - cand > 20, (cur, cand)

    def test_ate_reasonable_after_closure(self, with_loop):
        scene, eng = with_loop
        states = [r.state for r in eng.trajectory]
        first_ok = states.index(OK)
        idx = [i for i in range(first_ok, N_FRAMES) if states[i] == OK]
        est = eng.positions[idx]
        gt = np.stack([-scene.R[i].T @ scene.t[i] for i in idx])
        err = ate_rmse(est, gt, with_scale=True)
        span = np.linalg.norm(gt.max(0) - gt.min(0))
        assert err < 0.05 * span, (err, span)
