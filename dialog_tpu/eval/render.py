"""Offline map + trajectory renderer (the viewer, demoted off the hot path).

The reference runs a live Pangolin thread (canonical ``src/Viewer.cc`` +
``src/MapDrawer.cc`` — SURVEY.md §2.1); per the build plan (§7.2) the
TPU engine ships offline visualization instead: this module renders the
landmark cloud, keyframe frusta, and the (loop-corrected) trajectory to a
PNG/SVG with matplotlib. Pure host-side post-processing — never on the
perf path.

CLI: every ``run-*`` subcommand accepts ``--render out.png``.
"""

from __future__ import annotations

import numpy as np


def render_map(
    engine,
    path: str,
    gt_positions: np.ndarray | None = None,
    max_points: int = 20000,
    elev: float = -75.0,
    azim: float = -90.0,
) -> None:
    """Render the engine's map + trajectory to ``path`` (format by suffix)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lv = np.asarray(engine.m.lms.valid)
    pts = np.asarray(engine.m.lms.xyz)[lv]
    if len(pts) > max_points:
        pts = pts[np.random.default_rng(0).choice(len(pts), max_points, False)]
    kv = np.asarray(engine.m.kfs.valid)
    kR = np.asarray(engine.m.kfs.R)[kv]
    kt = np.asarray(engine.m.kfs.t)[kv]
    kf_C = (
        np.stack([-R.T @ t for R, t in zip(kR, kt)])
        if kv.any()
        else np.zeros((0, 3))
    )
    traj = engine.positions

    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")
    if len(pts):
        ax.scatter(
            pts[:, 0], pts[:, 1], pts[:, 2],
            s=0.5, c="0.55", alpha=0.4, linewidths=0, label="landmarks",
        )
    if len(traj):
        ax.plot(
            traj[:, 0], traj[:, 1], traj[:, 2],
            color="#d62728", lw=1.2, label="trajectory",
        )
    if len(kf_C):
        ax.scatter(
            kf_C[:, 0], kf_C[:, 1], kf_C[:, 2],
            s=8, c="#1f77b4", marker="^", label="keyframes",
        )
        # frustum axes: a short optical-axis tick per keyframe
        for R, t, C in zip(kR, kt, kf_C):
            z = R.T @ np.array([0.0, 0.0, 1.0])
            seg = np.stack([C, C + 0.4 * z])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], c="#1f77b4", lw=0.4)
    if gt_positions is not None and len(gt_positions) and len(traj):
        # Umeyama-align ground truth into the estimate's frame: a monocular
        # map lives at an arbitrary scale/gauge (the ATE evaluator aligns
        # the same way), so drawing raw metric gt would be off-scale
        from .ate import align_umeyama

        g = np.asarray(gt_positions, np.float64)
        n = min(len(g), len(traj))
        s, Ra, ta = align_umeyama(g[:n], np.asarray(traj[:n], np.float64))
        g = (s * (Ra @ g[:n].T)).T + ta
        ax.plot(
            g[:, 0], g[:, 1], g[:, 2],
            color="0.2", lw=0.8, ls="--", label="ground truth (aligned)",
        )
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.view_init(elev=elev, azim=azim)
    ax.legend(loc="upper right", fontsize=8)
    # equal aspect around the content
    allp = np.concatenate([p for p in (pts, traj, kf_C) if len(p)])
    if len(allp):
        c = allp.mean(0)
        r = max(float(np.abs(allp - c).max()), 1e-3)
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
