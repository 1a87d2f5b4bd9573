"""Command-line entry points.

Replaces the reference's per-dataset example binaries (canonical
``Examples/{Monocular,Stereo,RGB-D}/*.cc`` — SURVEY.md §2.1): run a
sequence through the engine, print per-frame timing stats (median/mean
track time, as the reference mains do at exit), save the trajectory, and
evaluate ATE when ground truth is available.

Usage::

    dialog-tpu run-tum  <seq_dir> [--settings TUM1.yaml] [--rgbd] [--out traj.txt]
    dialog-tpu run-kitti <seq_dir> [--settings KITTI00-02.yaml] [--mono] [--out traj.txt]
    dialog-tpu run-euroc <seq_dir> [--settings EuRoC.yaml] [--mono] [--out traj.txt]
    dialog-tpu run-synth [--frames N] [--trajectory sweep|loop]
    dialog-tpu bench
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _timing_stats(times: list[float]) -> str:
    t = np.sort(np.asarray(times))
    if len(t) == 0:
        return "no frames"
    return (
        f"median track time: {np.median(t) * 1e3:.1f} ms | "
        f"mean: {t.mean() * 1e3:.1f} ms | fps: {1.0 / max(t.mean(), 1e-9):.1f}"
    )


def _finish(eng, times, out_path, fmt, gt_positions=None, render=None):
    print(_timing_stats(times))
    states = [r.state for r in eng.trajectory]
    n_ok = sum(1 for s in states if s == "OK")
    print(f"tracked {n_ok}/{len(states)} frames | keyframes: {eng.kf_count}")
    if out_path:
        if fmt == "kitti":
            eng.save_trajectory_kitti(out_path)
        else:
            eng.save_trajectory_tum(out_path)
        print(f"trajectory -> {out_path}")
    if gt_positions is not None and n_ok > 10:
        from .eval.ate import ate_rmse

        idx = [i for i, s in enumerate(states) if s == "OK"]
        n = min(len(idx), len(gt_positions))
        err = ate_rmse(eng.positions[idx[:n]], gt_positions[:n])
        print(f"ATE RMSE (scale-aligned): {err * 100:.2f} cm")
    if render:
        from .eval.render import render_map

        render_map(eng, render, gt_positions=gt_positions)
        print(f"map render -> {render}")


def run_tum(args) -> None:
    from .config import Sensor, load_yaml, EngineConfig
    from .datasets import tum
    from .system import Engine

    sensor = Sensor.RGBD if args.rgbd else Sensor.MONOCULAR
    cfg = (
        load_yaml(args.settings, sensor)
        if args.settings
        else EngineConfig(sensor=sensor)
    )
    eng = Engine(cfg)
    times = []
    from .datasets.prefetch import prefetch

    import itertools

    src = tum.iter_rgbd(args.seq) if args.rgbd else tum.iter_mono(args.seq)
    if args.frames:
        src = itertools.islice(src, args.frames)
    it = prefetch(src)
    pipelined = getattr(args, "pipelined", False)
    for i, item in enumerate(it):
        if args.frames and i >= args.frames:
            break
        t0 = time.perf_counter()
        if args.rgbd:
            ts, img, depth = item
            eng.track_rgbd(img, depth, ts)
        elif pipelined:
            ts, img = item
            from .frontend import extract_features
            import jax.numpy as jnp

            eng.track_features_async(
                eng._undistort(extract_features(jnp.asarray(img), cfg)), ts
            )
        else:
            ts, img = item
            eng.track_image(img, ts)
        times.append(time.perf_counter() - t0)
    eng.flush()
    gt = None
    try:
        _, gt = tum.load_groundtruth(args.seq)
    except FileNotFoundError:
        pass
    _finish(eng, times, args.out, "tum", gt, render=getattr(args, "render", None))


def run_kitti(args) -> None:
    from .config import Sensor, load_yaml, EngineConfig
    from .datasets import kitti
    from .system import Engine

    sensor = Sensor.MONOCULAR if args.mono else Sensor.STEREO
    cfg = (
        load_yaml(args.settings, sensor)
        if args.settings
        else EngineConfig(
            fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
            bf=386.1448, width=1241, height=376, fps=10.0,
            n_features=2000, max_features=2048, sensor=sensor,
        )
    )
    eng = Engine(cfg)
    times = []
    from .datasets.prefetch import prefetch

    import itertools

    src = kitti.iter_mono(args.seq) if args.mono else kitti.iter_stereo(args.seq)
    if args.frames:
        src = itertools.islice(src, args.frames)
    it = prefetch(src)
    for i, item in enumerate(it):
        if args.frames and i >= args.frames:
            break
        t0 = time.perf_counter()
        if args.mono:
            ts, img = item
            eng.track_image(img, ts)
        else:
            ts, left, right = item
            eng.track_stereo(left, right, ts)
        times.append(time.perf_counter() - t0)
    eng.flush()
    _finish(eng, times, args.out, "kitti", render=getattr(args, "render", None))
    if getattr(args, "gt", None):
        # KITTI odometry devkit metrics (no alignment needed: relative)
        import numpy as np

        from .eval.ate import ate_rmse
        from .eval.rpe import kitti_odometry_errors

        gt_R, gt_t = kitti.load_poses_full(args.gt)
        poses = eng.final_poses()
        n = min(len(poses), len(gt_R))
        est_R = np.stack([p[0] for p in poses[:n]])
        est_t = np.stack([p[1] for p in poses[:n]])
        t_err, r_err, n_seg = kitti_odometry_errors(
            est_R, est_t, gt_R[:n], gt_t[:n]
        )
        C_est = -np.einsum("nij,ni->nj", est_R, est_t)
        C_gt = -np.einsum("nij,ni->nj", gt_R[:n], gt_t[:n])
        print(
            f"KITTI devkit ({n_seg} segments): translation "
            f"{t_err * 100:.2f} % | rotation "
            f"{np.degrees(r_err) * 100:.4f} deg/100m | "
            f"ATE RMSE {ate_rmse(C_est, C_gt):.2f} m"
        )


def run_euroc(args) -> None:
    """EuRoC MAV sequence (reference: Examples/*/mono_euroc, stereo_euroc)."""
    from .config import Sensor, load_yaml, EngineConfig
    from .datasets import euroc
    from .system import Engine

    sensor = Sensor.MONOCULAR if args.mono else Sensor.STEREO
    cfg = (
        load_yaml(args.settings, sensor)
        if args.settings
        else EngineConfig(
            # EuRoC cam0 defaults (ASL calibration, pinhole radtan)
            fx=458.654, fy=457.296, cx=367.215, cy=248.375,
            k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
            bf=47.90639384423901, width=752, height=480, fps=20.0,
            sensor=sensor,
        )
    )
    eng = Engine(cfg)
    times = []
    from .datasets.prefetch import prefetch

    import itertools

    src = euroc.iter_mono(args.seq) if args.mono else euroc.iter_stereo(args.seq)
    if args.frames:
        src = itertools.islice(src, args.frames)
    it = prefetch(src)
    for i, item in enumerate(it):
        if args.frames and i >= args.frames:
            break
        t0 = time.perf_counter()
        if args.mono:
            ts, img = item
            eng.track_image(img, ts)
        else:
            ts, left, right = item
            eng.track_stereo(left, right, ts)
        times.append(time.perf_counter() - t0)
    eng.flush()
    gt = None
    try:
        _, gt = euroc.load_groundtruth(args.seq)
    except (FileNotFoundError, OSError):
        pass
    _finish(eng, times, args.out, "tum", gt, render=getattr(args, "render", None))


def run_synth(args) -> None:
    from .config import EngineConfig
    from .datasets import synth
    from .eval.ate import ate_rmse
    from .system import Engine

    cfg = EngineConfig(
        max_features=512, max_keyframes=128, max_landmarks=16384,
        max_local_lms=4096, max_frames_between_kf=8,
    )
    n = args.frames or 60
    scene = synth.make_scene(
        seed=0, n_points=1500, n_frames=n, trajectory=args.trajectory, cfg=cfg
    )
    eng = Engine(cfg)
    times = []
    for i in range(n):
        fr, _ = synth.observe(scene, i, noise_px=0.5)
        t0 = time.perf_counter()
        eng.track_features(fr, float(i) / 30.0)
        times.append(time.perf_counter() - t0)
    eng.flush()   # drain pipeline + any in-flight async GBA before evaluating
    states = [r.state for r in eng.trajectory]
    idx = [i for i, s in enumerate(states) if s == "OK"]
    gt = np.stack([-scene.R[i].T @ scene.t[i] for i in idx])
    print(_timing_stats(times))
    print(
        f"tracked {len(idx)}/{n} | kfs {eng.kf_count} | "
        f"ATE {ate_rmse(eng.positions[idx], gt) * 100:.2f} cm"
    )
    if args.out:
        eng.save_trajectory_tum(args.out)
    if getattr(args, "render", None):
        from .eval.render import render_map

        render_map(eng, args.render, gt_positions=gt)
        print(f"map render -> {args.render}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="dialog-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("run-tum", help="run a TUM sequence (mono or RGB-D)")
    t.add_argument("seq")
    t.add_argument("--settings")
    t.add_argument("--rgbd", action="store_true")
    t.add_argument("--frames", type=int)
    t.add_argument("--out")
    t.add_argument("--render", help="render map+trajectory to an image file")
    t.add_argument("--pipelined", action="store_true",
                   help="throughput mode: resolve results a few frames behind")
    t.set_defaults(fn=run_tum)

    k = sub.add_parser("run-kitti", help="run a KITTI sequence (stereo or mono)")
    k.add_argument("seq")
    k.add_argument("--settings")
    k.add_argument("--mono", action="store_true")
    k.add_argument("--frames", type=int)
    k.add_argument("--out")
    k.add_argument("--render", help="render map+trajectory to an image file")
    k.add_argument("--pipelined", action="store_true")
    k.add_argument(
        "--gt", help="devkit poses file (3x4/line): print KITTI odometry "
        "metrics + ATE",
    )
    k.set_defaults(fn=run_kitti)

    e = sub.add_parser("run-euroc", help="run a EuRoC MAV sequence (mono or stereo)")
    e.add_argument("seq", help="sequence dir containing mav0/")
    e.add_argument("--settings")
    e.add_argument("--mono", action="store_true")
    e.add_argument("--frames", type=int)
    e.add_argument("--out")
    e.add_argument("--render", help="render map+trajectory to an image file")
    e.set_defaults(fn=run_euroc)

    s = sub.add_parser("run-synth", help="run a synthetic sequence")
    s.add_argument("--frames", type=int)
    s.add_argument("--trajectory", default="sweep", choices=["sweep", "loop"])
    s.add_argument("--out")
    s.add_argument("--render", help="render map+trajectory to an image file")
    s.set_defaults(fn=run_synth)

    b = sub.add_parser("bench", help="run the benchmark harness")
    b.set_defaults(fn=lambda a: __import__("bench").main())

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
