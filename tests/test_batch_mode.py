"""Batched pipelined tracking parity (one dispatch per B frames)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.eval.ate import ate_rmse
from dialog_tpu.system import Engine, OK

CFG = EngineConfig(
    max_features=512, max_keyframes=64, max_landmarks=8192,
    max_local_lms=2048, max_frames_between_kf=8,
)
N, B = 48, 4


def _scene_frames():
    scene = synth.make_scene(seed=51, n_points=700, n_frames=N, cfg=CFG)
    frames = [synth.observe(scene, i, noise_px=0.4)[0] for i in range(N)]
    gt = np.stack([-scene.R[i].T @ scene.t[i] for i in range(N)])
    return frames, gt


class TestBatchMode:
    @pytest.mark.soak
    def test_parity_with_sync(self):
        frames, gt = _scene_frames()
        sync = Engine(CFG)
        for i in range(N):
            sync.track_features(frames[i], i / 30.0)
        idx_s = [i for i, r in enumerate(sync.trajectory) if r.state == OK]
        ate_s = ate_rmse(sync.positions[idx_s], gt[idx_s])

        eng = Engine(CFG)
        for i in range(0, N, B):
            batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames[i : i + B])
            eng.track_batch(batch, [j / 30.0 for j in range(i, i + B)])
        eng.flush()
        assert len(eng.trajectory) == N
        idx = [i for i, r in enumerate(eng.trajectory) if r.state == OK]
        assert len(idx) >= len(idx_s) - B          # at most one batch worse
        ate_b = ate_rmse(eng.positions[idx], gt[idx])
        assert ate_b < max(3.0 * ate_s, 0.12), (ate_b, ate_s)

    def test_occlusion_recovery(self):
        frames, _ = _scene_frames()
        eng = Engine(CFG)
        for i in range(0, N, B):
            fs = list(frames[i : i + B])
            for k in range(len(fs)):
                if 24 <= i + k < 28:
                    fs[k] = fs[k]._replace(valid=jnp.zeros_like(fs[k].valid))
            batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fs)
            eng.track_batch(batch, [j / 30.0 for j in range(i, i + B)])
        eng.flush()
        states = [r.state for r in eng.trajectory]
        assert len(states) == N
        assert states[-1] == OK          # recovered after the occlusion
