"""System modes: localization-only, reset, checkpoint resume, map export."""

import numpy as np

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.system import Engine, OK, NOT_INITIALIZED

CFG = EngineConfig(
    max_features=512, max_keyframes=64, max_landmarks=8192,
    max_local_lms=2048, max_frames_between_kf=6,
    vocab_words=512, vocab_min_kfs=4,
)


def _run(eng, scene, frames):
    for i in frames:
        fr, _ = synth.observe(scene, i, noise_px=0.4)
        eng.track_features(fr, float(i) / 30.0)


class TestLocalizationMode:
    def test_map_frozen_but_tracking_continues(self):
        scene = synth.make_scene(seed=31, n_points=600, n_frames=40, cfg=CFG)
        eng = Engine(CFG)
        _run(eng, scene, range(20))
        kfs_before = eng.kf_count
        n_lms_before = int(np.sum(np.asarray(eng.m.lms.valid)))
        eng.set_localization_mode(True)
        _run(eng, scene, range(20, 40))
        assert eng.kf_count == kfs_before
        assert int(np.sum(np.asarray(eng.m.lms.valid))) == n_lms_before
        assert all(r.state == OK for r in eng.trajectory[-15:])


class TestCheckpointResume:
    def test_resume_relocalizes_into_loaded_map(self, tmp_path):
        scene = synth.make_scene(seed=32, n_points=700, n_frames=40, cfg=CFG)
        eng = Engine(CFG)
        _run(eng, scene, range(25))
        assert eng.kf_count >= 4
        p = str(tmp_path / "map.npz")
        eng.save_checkpoint(p)

        eng2 = Engine(CFG)
        eng2.load_checkpoint(p)
        assert eng2.kf_count == eng.kf_count
        _run(eng2, scene, range(25, 40))
        # relocalized against the loaded map and kept tracking
        assert eng2.trajectory[-1].state == OK
        assert eng2.trajectory[-1].n_tracked > 50


class TestResetAndExport:
    def test_reset_clears_everything(self):
        scene = synth.make_scene(seed=33, n_points=600, n_frames=12, cfg=CFG)
        eng = Engine(CFG)
        _run(eng, scene, range(12))
        eng.reset()
        assert eng.state == NOT_INITIALIZED
        assert eng.kf_count == 0
        assert int(np.sum(np.asarray(eng.m.lms.valid))) == 0

    def test_ply_export(self, tmp_path):
        scene = synth.make_scene(seed=34, n_points=600, n_frames=12, cfg=CFG)
        eng = Engine(CFG)
        _run(eng, scene, range(12))
        p = str(tmp_path / "map.ply")
        eng.export_map_ply(p)
        lines = open(p).read().splitlines()
        n = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
        assert n > 100
        assert len(lines) == lines.index("end_header") + 1 + n


def test_save_keyframe_trajectory(tmp_path):
    """Reference: System::SaveKeyFrameTrajectoryTUM — keyframe-only export."""
    from dialog_tpu.config import EngineConfig
    from dialog_tpu.datasets import synth
    from dialog_tpu.system import Engine

    cfg = EngineConfig(max_features=512, max_frames_between_kf=6)
    scene = synth.make_scene(seed=2, n_points=4000, n_frames=40, cfg=cfg)
    eng = Engine(cfg)
    for i in range(40):
        fr, _ = synth.observe(scene, i, noise_px=0.5)
        eng.track_features(fr, float(i) / 30.0)
    eng.flush()
    p = tmp_path / "kf_traj.txt"
    eng.save_keyframe_trajectory_tum(str(p))
    lines = [l for l in p.read_text().splitlines() if l and not l.startswith("#")]
    assert len(lines) == eng.kf_count
    assert all(len(l.split()) == 8 for l in lines)
    # timestamps strictly increasing (ordered by insertion number)
    tss = [float(l.split()[0]) for l in lines]
    assert all(b > a for a, b in zip(tss, tss[1:]))


def test_map_render(tmp_path):
    """Offline viewer (reference: Viewer/MapDrawer, demoted per plan)."""
    from dialog_tpu.config import EngineConfig
    from dialog_tpu.datasets import synth
    from dialog_tpu.eval.render import render_map
    from dialog_tpu.system import Engine

    cfg = EngineConfig(max_features=512, max_frames_between_kf=8)
    scene = synth.make_scene(seed=3, n_points=3000, n_frames=24, cfg=cfg)
    eng = Engine(cfg)
    for i in range(24):
        fr, _ = synth.observe(scene, i, noise_px=0.5)
        eng.track_features(fr, float(i) / 30.0)
    eng.flush()
    p = tmp_path / "map.png"
    gt = np.stack([-scene.R[i].T @ scene.t[i] for i in range(24)])
    render_map(eng, str(p), gt_positions=gt)
    assert p.exists() and p.stat().st_size > 10_000


def test_runlogger_records_gba_event(tmp_path):
    """Engine's saturation events reach the JSONL log (SURVEY §5 metrics)."""
    import json

    from dialog_tpu.config import EngineConfig
    from dialog_tpu.datasets import synth
    from dialog_tpu.instrument import RunLogger
    from dialog_tpu.system import Engine

    cfg = EngineConfig(max_features=512, max_frames_between_kf=6,
                       max_obs_per_lm=4)
    scene = synth.make_scene(seed=7, n_points=8000, n_frames=40,
                             trajectory="loop", cfg=cfg, period=200)
    eng = Engine(cfg)
    eng.logger = RunLogger(str(tmp_path / "run.jsonl"))
    for i in range(40):
        fr, _ = synth.observe(scene, i, noise_px=0.5)
        eng.track_features(fr, i / 30.0)
    eng._start_gba(iters=1)     # exercise the event path directly
    eng.flush()
    eng.logger.close()
    rows = [json.loads(l) for l in (tmp_path / "run.jsonl").read_text().splitlines()]
    assert eng.stats["gba_runs"] == 1
    if eng.stats["gba_obs_dropped"]:
        assert any(r.get("event") == "gba_obs_dropped" for r in rows)
