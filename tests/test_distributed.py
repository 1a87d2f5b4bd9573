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


@pytest.mark.soak
class TestMultiProcessBootstrap:
    def test_two_process_smoke(self, tmp_path):
        sock = socket.socket()
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]
        sock.close()
        script = tmp_path / "worker.py"
        script.write_text(WORKER)
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
            out, _ = p.communicate(timeout=240)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out}"
            assert f"WORKER_OK {i}" in out
