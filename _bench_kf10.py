"""Benchmark harness: frames/s of the full tracking pipeline.

Emits ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline is the reference C++ pipeline's ~30 fps on TUM-class input
(SURVEY.md §6 proxy numbers; BASELINE.json `published` is empty).

Runs on whatever backend JAX selects (the driver runs it on the real TPU
chip). The workload is the reference's hot path: 640x480 monocular frames,
1000 features, 8 pyramid levels — frontend + matching + pose optimization +
keyframe mapping/BA + loop detection amortized over the sequence.

The warmup region compiles EVERY runtime path before timing starts (sync
init, batched tracking, keyframe mapping + local BA, vocabulary training,
loop detection, and relocalization via a forced occlusion) — the analog of
the reference's untimed ~10 s vocabulary load at startup.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 30.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dialog_tpu.config import EngineConfig
    from dialog_tpu.datasets import synth
    from dialog_tpu.system import Engine

    cfg = EngineConfig(
        width=640, height=480, n_features=1000, max_features=1024,
        max_keyframes=256, max_landmarks=16384, max_local_lms=2048,
        max_local_kfs=16, max_fixed_kfs=16, max_obs_per_lm=8,
        local_ba_iters=5, max_frames_between_kf=10,
    )
    n_frames = 264
    scene = synth.make_scene(seed=3, n_points=2500, n_frames=n_frames, cfg=cfg)
    # pre-uploaded device images: the reference's timing also starts from an
    # in-memory cv::Mat, and the engine's "memory" is HBM
    images = [
        jax.block_until_ready(jnp.asarray(synth.render_image(scene, i)))
        for i in range(n_frames)
    ]

    from dialog_tpu.frontend import extract_features_batch

    B = 8
    eng = Engine(cfg)

    def run_batch(i, occlude=False):
        batch = extract_features_batch(jnp.stack(images[i : i + B]), cfg)
        if occlude:
            # blank the first half of the batch: forces LOST and compiles
            # the relocalization path during warmup
            batch = batch._replace(
                valid=batch.valid.at[: B // 2].set(False)
            )
        eng.track_batch(batch, [float(i + j) / 30.0 for j in range(B)])

    # --- warmup: frames [0, warm_end) -----------------------------------
    warm_end = 104
    for i in range(8):
        eng.track_image(images[i], float(i) / 30.0)
    for i in range(8, warm_end, B):
        run_batch(i, occlude=(i == 48))
    eng.flush()
    # compile the loop-detection path (dispatch + evaluate) explicitly: the
    # organic warmup may end before kf_count crosses the detection threshold,
    # and a first-time _pack_detect compile inside the timed region would be
    # charged as ~0.5 s of fake frame time
    if eng._vocab is not None:
        eng._loop.dispatch(eng.m, eng._bow_db, eng._vocab, max(eng.kf_count - 1, 0))
        det = eng._loop.take_pending()
        if det is not None:
            eng._loop.evaluate(det[0], np.asarray(det[1]), det[2])
    # ensure tracking is healthy before the timed region
    while eng.frame_id < warm_end + 2 * B and eng.state != "OK":
        i = eng.frame_id
        eng.track_features(
            jax.tree_util.tree_map(
                lambda x: x[0],
                extract_features_batch(jnp.stack(images[i : i + 1]), cfg),
            ),
            float(i) / 30.0,
        )

    # --- timed region ----------------------------------------------------
    start = ((eng.frame_id + B - 1) // B) * B
    t0 = time.perf_counter()
    for i in range(start, n_frames - B + 1, B):
        run_batch(i)
    eng.flush()
    jax.block_until_ready(eng.m.kfs.R)
    elapsed = time.perf_counter() - t0
    n_timed = ((n_frames - B + 1 - start) // B) * B
    fps = n_timed / elapsed

    print(
        json.dumps(
            {
                "metric": "tracking_fps_tum_class_mono",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
