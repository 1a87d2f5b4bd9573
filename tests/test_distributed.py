"""Mesh construction + jax.distributed bootstrap tests (SURVEY.md §2.3).

The multi-host story needs evidence beyond annotations: build the
('hosts','chips') mesh on the virtual device set, and smoke-test the real
``jax.distributed`` bootstrap with two local CPU processes exchanging a
collective — the closest a single machine gets to the N-host config.
"""

import os
import socket
import subprocess

import pytest
import sys
import textwrap

import jax
import numpy as np

from dialog_tpu import distributed


class TestMesh:
    def test_make_mesh_shape(self):
        mesh = distributed.make_mesh()
        assert mesh.axis_names == ("hosts", "chips")
        assert mesh.devices.shape == (1, len(jax.devices()))

    def test_make_mesh_subset(self):
        mesh = distributed.make_mesh(4)
        assert mesh.devices.shape == (1, 4)

    def test_landmark_sharding_spec(self):
        mesh = distributed.make_mesh()
        s = distributed.landmark_sharding(mesh)
        assert s.spec == jax.sharding.PartitionSpec(("hosts", "chips"))

    def test_initialize_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        distributed.initialize()   # must not raise or reconfigure anything
        assert jax.process_count() == 1


WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dialog_tpu import distributed

    port, pid = sys.argv[1], int(sys.argv[2])
    distributed.initialize(
        coordinator=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())   # 2 per process
    mesh = distributed.make_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape
    # one real cross-process collective through the mesh
    from jax.experimental import multihost_utils
    total = multihost_utils.process_allgather(jax.numpy.ones(()) * (pid + 1))
    assert float(total.sum()) == 3.0, total
    print("WORKER_OK", pid)
    """
)


BA_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from dialog_tpu import distributed
    from dialog_tpu.optim.global_ba import shard_problem
    from dialog_tpu.optim.schur_pcg import solve_ba_pcg
    from dialog_tpu.optim.synth_problem import FIXTURE_CFG as CFG, make_problem

    port, pid = sys.argv[1], int(sys.argv[2])
    distributed.initialize(
        coordinator=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    mesh = distributed.make_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    # identical deterministic problem in both processes (same seed)
    prob, Rs, ts, pts, n_cams, n_pts = make_problem(seed=5)
    # single-process reference solve (local devices only)
    R1, t1, x1, c1 = solve_ba_pcg(prob, CFG, iters=4, cg_iters=64)

    # landmark axis sharded over the 2x2 (process x device) mesh: the CG
    # matvec's camera-system reductions become XLA cross-process all-reduces
    probs = shard_problem(prob, mesh)
    R2, t2, x2, c2 = solve_ba_pcg(probs, CFG, iters=4, cg_iters=64)

    # replicated outputs are fully addressable everywhere
    dR = float(np.max(np.abs(np.asarray(R1) - np.asarray(R2))))
    dt = float(np.max(np.abs(np.asarray(t1) - np.asarray(t2))))
    assert dR < 2e-4, dR
    assert dt < 2e-3, dt
    # the sharded landmark output: compare each local shard to the
    # reference slice it owns
    x1_np = np.asarray(x1)
    for s in x2.addressable_shards:
        sl = s.index[0]
        np.testing.assert_allclose(
            np.asarray(s.data), x1_np[sl], atol=5e-3
        )
    print("BA_WORKER_OK", pid, "dR", dR, "dt", dt)
    """
)


def _run_two_process(tmp_path, script_text, ok_token):
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"{ok_token} {i}" in out


@pytest.mark.soak
class TestMultiProcessBootstrap:
    def test_two_process_smoke(self, tmp_path):
        _run_two_process(tmp_path, WORKER, "WORKER_OK")

    def test_sharded_ba_across_process_boundary(self, tmp_path):
        """A real BA solved over the 2-process x 2-device mesh must match the
        single-process solve (VERDICT r4 directive 4: the one DCN-analog
        experiment this sandbox permits)."""
        _run_two_process(tmp_path, BA_WORKER, "BA_WORKER_OK")
