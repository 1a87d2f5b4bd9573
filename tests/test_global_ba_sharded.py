"""Sharded global BA: 1-device vs 8-device mesh parity + engine wiring.

BASELINE.json's scaling axis (SURVEY.md §2.3 "Distributed BA =
landmark-sharded Schur reduction"): the landmark axis of the global problem
shards over the mesh, cameras stay replicated, and XLA inserts the
cross-shard reductions. These tests run on the virtual 8-device CPU mesh
provisioned by conftest.py — the same annotations drive real ICI collectives
on a v5e-8 (reference: Optimizer::GlobalBundleAdjustemnt [sic], which is
single-threaded CPU Cholesky and has no scaling axis at all).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dialog_tpu.config import EngineConfig
from dialog_tpu.datasets import synth
from dialog_tpu.optim.global_ba import (
    build_global_problem,
    global_bundle_adjustment,
    shard_problem,
)
from dialog_tpu.optim.local_ba import solve_ba
from dialog_tpu.system import Engine


def _small_cfg():
    return EngineConfig(
        width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0,
        n_features=256, max_features=256,
        max_keyframes=32, max_landmarks=2048, max_local_lms=1024,
        max_local_kfs=8, max_fixed_kfs=4, max_obs_per_lm=8,
        init_min_features=40, init_min_matches=40, init_min_good=25,
    )


@pytest.fixture(scope="module")
def engine_map():
    """A real map from a short synthetic run (shared across tests)."""
    cfg = _small_cfg()
    scene = synth.make_scene(seed=5, n_points=600, n_frames=30, cfg=cfg)
    eng = Engine(cfg)
    eng.loop_closing_enabled = False
    for i in range(30):
        fr, _ = synth.observe(scene, i, noise_px=0.4)
        eng.track_features(fr, float(i) / 30.0)
    assert eng.kf_count >= 4, "map failed to grow enough keyframes"
    return eng.m, cfg


class TestShardedGlobalBA:
    def test_1dev_vs_8dev_parity(self, engine_map):
        m, cfg = engine_map
        prob, _ = build_global_problem(m, cfg)

        # single-device solve
        R1, t1, x1, c1 = solve_ba(prob, cfg, iters=5, chi2_th=cfg.chi2_mono)

        # 8-device landmark-sharded solve
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        probs = shard_problem(prob, mesh)
        # sharding actually applied to the landmark axis
        shd = probs.xyz.sharding
        assert not shd.is_fully_replicated
        R8, t8, x8, c8 = solve_ba(probs, cfg, iters=5, chi2_th=cfg.chi2_mono)

        # identical up to cross-shard reduction order
        np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), atol=1e-4)
        valid = np.asarray(m.lms.valid)
        np.testing.assert_allclose(
            np.asarray(x8)[valid], np.asarray(x1)[valid], atol=1e-3
        )

    def test_sharded_ba_reduces_reprojection_error(self, engine_map):
        m, cfg = engine_map
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        prob = shard_problem(build_global_problem(m, cfg)[0], mesh)

        def cost(R, t, xyz):
            from dialog_tpu.optim.local_ba import _residuals, _robust_weights

            r, _, _, ok = _residuals(
                prob, R, t, xyz, cfg.fx, cfg.fy, cfg.cx, cfg.cy
            )
            _, c, _ = _robust_weights(r, prob.obs_w, ok, cfg.chi2_mono)
            return float(c)

        c0 = cost(prob.R, prob.t, prob.xyz)
        R, t, xyz, _ = solve_ba(prob, cfg, iters=6, chi2_th=cfg.chi2_mono)
        c1 = cost(R, t, xyz)
        assert np.isfinite(c1)
        assert c1 <= c0 + 1e-3

    def test_engine_global_ba_with_mesh_matches_without(self, engine_map):
        """The engine-facing wrapper (the loop-closure GBA call) shards and
        returns a map numerically equivalent to the unsharded one."""
        m, cfg = engine_map
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("hosts", "chips")
        )
        m1 = global_bundle_adjustment(m, cfg, iters=4)
        m8 = global_bundle_adjustment(m, cfg, iters=4, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(m8.kfs.R), np.asarray(m1.kfs.R), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(m8.kfs.t), np.asarray(m1.kfs.t), atol=1e-4
        )
        valid = np.asarray(m.lms.valid)
        np.testing.assert_allclose(
            np.asarray(m8.lms.xyz)[valid],
            np.asarray(m1.lms.xyz)[valid],
            atol=1e-3,
        )
        # the engine map must come back on a single device (no sharding
        # leakage into the tracking hot path)
        assert m8.lms.xyz.sharding.is_fully_replicated or (
            len(m8.lms.xyz.sharding.device_set) == 1
        )

    def test_engine_constructs_mesh_with_multiple_devices(self):
        """Engine.mesh is built whenever >1 device is visible (conftest
        provisions 8 CPU devices), so loop-closure GBA actually shards."""
        eng = Engine(_small_cfg())
        assert eng.mesh is not None
        assert len(eng.mesh.devices.flatten()) == len(jax.devices())
