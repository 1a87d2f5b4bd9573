"""Image-in-the-loop end-to-end test (VERDICT r3 directive 9).

Drives the REAL frontend — synth.render_image -> extract_features_batch ->
track_batch — so a frontend regression that tanks tracking fails CI, not
just the benchmark. Exactly the bench workload (640x480, 2500 landmarks,
1000 features, bench scene seed and camera cadence), truncated to a
CPU-mesh-sized prefix. The camera path is generated at the bench's
168-frame cadence: compressing the sweep into fewer frames triples the
per-frame motion and tracking legitimately fails.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.eval.ate import ate_rmse
from dialog_tpu.frontend import extract_features_batch
from dialog_tpu.system import Engine, OK

pytestmark = pytest.mark.soak

CFG = EngineConfig(
    width=640, height=480, n_features=1000, max_features=1024,
    max_keyframes=64, max_landmarks=16384, max_local_lms=2048,
    max_local_kfs=16, max_fixed_kfs=16, max_obs_per_lm=8,
    local_ba_iters=5, max_frames_between_kf=30,
)
N_FRAMES = 56
B = 8


@pytest.fixture(scope="module")
def run():
    scene = synth.make_scene(seed=3, n_points=2500, n_frames=168, cfg=CFG)
    images = [jnp.asarray(synth.render_image(scene, i)) for i in range(N_FRAMES)]
    eng = Engine(CFG)
    # per-frame until initialized AND the early map has a few keyframes —
    # the batched mode freezes the map for a whole batch, which the thin
    # 2-keyframe init map cannot survive (the bench's warmup does the same)
    i = 0
    while (eng.state != OK or eng.kf_count < 4) and i < 24:
        eng.track_image(images[i], float(i) / 30.0)
        i += 1
    while i + B <= N_FRAMES:
        batch = extract_features_batch(jnp.stack(images[i : i + B]), CFG)
        eng.track_batch(batch, [float(i + j) / 30.0 for j in range(B)])
        i += B
    eng.flush()
    return scene, eng


class TestImageInTheLoop:
    def test_tracks_through_frontend(self, run):
        scene, eng = run
        assert eng.state == OK
        states = [r.state for r in eng.trajectory]
        first_ok = states.index(OK)
        assert first_ok < 12
        ok_frac = np.mean([s == OK for s in states[first_ok:]])
        assert ok_frac > 0.95, ok_frac

    def test_map_grown_from_images(self, run):
        scene, eng = run
        assert eng.kf_count >= 4
        assert int(np.sum(np.asarray(eng.m.lms.valid))) > 300

    def test_ate_gate(self, run):
        scene, eng = run
        recs = [r for r in eng.trajectory if r.state == OK]
        est = np.stack(
            [-R.T @ t for (R, t), r in zip(eng.final_poses(), eng.trajectory)
             if r.state == OK]
        )
        gt = np.stack([-scene.R[r.frame_id].T @ scene.t[r.frame_id] for r in recs])
        # on this truncated prefix the early-map monocular drift dominates
        # (measured 0.16 m here and 0.26 m at the round-3 commit — the
        # PARITY.md ~2.4 cm figure is the full matured-map sweep); the gate
        # catches frontend/tracking regressions, not BA noise
        ate = ate_rmse(est, gt, with_scale=True)
        assert ate < 0.35, ate
