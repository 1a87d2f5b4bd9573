"""EuRoC loader + CLI wiring test (VERDICT r3: euroc.py was dead code).

Builds a miniature ASL-layout sequence (mav0/cam0+cam1 CSVs and PNGs,
ground-truth CSV) from the synthetic renderer and drives it through the
real CLI entry point end to end.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import euroc, synth
from dialog_tpu.cli import main as cli_main

CFG = EngineConfig(
    width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
    n_features=300, max_features=512,
)
N = 6


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc_seq")
    scene = synth.make_scene(seed=9, n_points=500, n_frames=N, cfg=CFG)
    b = 0.11
    scene_r = scene._replace(t=scene.t - np.array([b, 0, 0], np.float32))
    gt_rows = []
    for cam, sc in (("cam0", scene), ("cam1", scene_r)):
        d = root / "mav0" / cam / "data"
        os.makedirs(d)
        with open(root / "mav0" / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(N):
                ts_ns = int((1403636579 + i * 0.05) * 1e9)
                name = f"{ts_ns}.png"
                img = synth.render_image(sc, i).clip(0, 255).astype(np.uint8)
                cv2.imwrite(str(d / name), img)
                f.write(f"{ts_ns},{name}\n")
                if cam == "cam0":
                    C = -sc.R[i].T @ sc.t[i]
                    gt_rows.append((ts_ns, *C))
    gd = root / "mav0" / "state_groundtruth_estimate0"
    os.makedirs(gd)
    with open(gd / "data.csv", "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m]\n")
        for r in gt_rows:
            f.write(",".join(str(x) for x in r) + "\n")
    return str(root)


class TestEurocLoader:
    def test_mono_iter(self, seq_dir):
        frames = list(euroc.iter_mono(seq_dir))
        assert len(frames) == N
        ts, img = frames[0]
        assert img.shape == (240, 320) and img.dtype == np.float32
        assert frames[1][0] > ts

    def test_stereo_iter_pairs(self, seq_dir):
        frames = list(euroc.iter_stereo(seq_dir))
        assert len(frames) == N
        ts, l, r = frames[0]
        assert l.shape == r.shape == (240, 320)
        assert not np.array_equal(l, r)   # genuinely different viewpoints

    def test_groundtruth(self, seq_dir):
        ts, pos = euroc.load_groundtruth(seq_dir)
        assert pos.shape == (N, 3)

    def test_cli_end_to_end(self, seq_dir, tmp_path, capsys):
        yaml = tmp_path / "cfg.yaml"
        yaml.write_text(
            "Camera.fx: 260.0\nCamera.fy: 260.0\nCamera.cx: 160.0\n"
            "Camera.cy: 120.0\nCamera.width: 320\nCamera.height: 240\n"
            "Camera.fps: 20.0\nORBextractor.nFeatures: 300\n"
        )
        out = tmp_path / "traj.txt"
        cli_main([
            "run-euroc", seq_dir, "--mono", "--settings", str(yaml),
            "--out", str(out),
        ])
        printed = capsys.readouterr().out
        assert "tracked" in printed
        assert out.exists() and len(out.read_text().splitlines()) == N
