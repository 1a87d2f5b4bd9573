"""End-to-end engine test on a synthetic sequence (SURVEY.md §7.3 stage 6).

The engine consumes pre-extracted synthetic FrameArrays (frontend bypassed:
that path is covered by test_frontend) and must initialize, track the whole
sweep, insert keyframes, triangulate, and come out with a low ATE against
the known trajectory.
"""

import numpy as np
import pytest

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.eval.ate import ate_rmse
from dialog_tpu.system import Engine, OK

CFG = EngineConfig(
    max_features=512,
    max_keyframes=64,
    max_landmarks=4096,
    max_local_lms=2048,
    max_frames_between_kf=8,
)


@pytest.fixture(scope="module")
def run():
    scene = synth.make_scene(seed=4, n_points=500, n_frames=40, cfg=CFG)
    eng = Engine(CFG)
    for i in range(40):
        fr, _ = synth.observe(scene, i, noise_px=0.4, desc_flips=6)
        eng.track_features(fr, timestamp=float(i) / 30.0)
    return scene, eng


class TestEndToEnd:
    def test_initializes_and_tracks(self, run):
        scene, eng = run
        assert eng.state == OK
        states = [r.state for r in eng.trajectory]
        # after init, every frame tracked
        first_ok = states.index(OK)
        assert first_ok < 10
        assert all(s == OK for s in states[first_ok:])

    def test_keyframes_and_landmarks_created(self, run):
        scene, eng = run
        assert eng.kf_count >= 4
        n_lms = int(np.sum(np.asarray(eng.m.lms.valid)))
        assert n_lms > 200

    def test_ate_low(self, run):
        scene, eng = run
        states = [r.state for r in eng.trajectory]
        first_ok = states.index(OK)
        est = eng.positions[first_ok:]
        gt = np.stack(
            [-scene.R[i].T @ scene.t[i] for i in range(first_ok, len(states))]
        )
        # monocular: align with scale
        err = ate_rmse(est, gt, with_scale=True)
        scene_span = np.linalg.norm(gt.max(0) - gt.min(0))
        assert err < 0.02 * max(scene_span, 1.0), (err, scene_span)

    def test_trajectory_export_roundtrip(self, run, tmp_path):
        scene, eng = run
        p = tmp_path / "traj.txt"
        eng.save_trajectory_tum(str(p))
        from dialog_tpu.eval.trajectory import load_tum

        ts, pos, quat = load_tum(str(p))
        assert len(ts) == len(eng.trajectory)
        np.testing.assert_allclose(pos, eng.positions, atol=1e-5)
