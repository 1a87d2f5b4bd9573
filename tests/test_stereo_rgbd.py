"""Stereo/RGB-D pipeline tests: known-scale tracking (SURVEY.md §7.3 st. 8)."""

import numpy as np
import pytest

from dialog_tpu.config import EngineConfig, Sensor
from dialog_tpu.datasets import synth
from dialog_tpu.eval.ate import ate_rmse
from dialog_tpu.system import Engine, OK

CFG = EngineConfig(
    sensor=Sensor.STEREO,
    bf=517.3 * 0.54,         # KITTI-like 54 cm baseline
    th_depth=35.0,
    max_features=512,
    max_keyframes=64,
    max_landmarks=8192,
    max_local_lms=2048,
    max_frames_between_kf=8,
)


@pytest.fixture(scope="module")
def run():
    scene = synth.make_scene(seed=9, n_points=900, n_frames=40, cfg=CFG)
    eng = Engine(CFG)
    for i in range(40):
        fr, _ = synth.observe(scene, i, noise_px=0.4, desc_flips=6)
        eng.track_features(fr, float(i) / 30.0)
    return scene, eng


class TestStereo:
    def test_initializes_first_frame(self, run):
        scene, eng = run
        # depth bootstrap: OK from frame 0, no two-view init needed
        assert eng.trajectory[0].state == OK

    def test_tracks_whole_sequence(self, run):
        scene, eng = run
        states = [r.state for r in eng.trajectory]
        assert all(s == OK for s in states), states

    def test_metric_scale_ate(self, run):
        """Stereo knows scale: evaluate ATE WITHOUT scale alignment."""
        scene, eng = run
        est = eng.positions
        gt = np.stack([-scene.R[i].T @ scene.t[i] for i in range(40)])
        err = ate_rmse(est, gt, with_scale=False)
        assert err < 0.05, err   # metres, real scale
