"""Multi-host bootstrap and mesh construction.

The reference is single-host shared-memory (SURVEY.md §2.3); the TPU build
scales global BA across chips and hosts via `jax.distributed` + a
('hosts', 'chips') mesh with XLA collectives over ICI/DCN. This module is
the one place that knows about processes and topology.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the jax.distributed runtime (one process per host).

    No-ops when single-process (the common case in tests and on one chip).
    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:   # NOT `or`: process 0 is falsy
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: int | None = None) -> Mesh:
    """('hosts', 'chips') mesh over the global device set.

    With one process the 'hosts' axis is 1; landmarks shard over both axes
    flattened (see optim.global_ba / __graft_entry__.dryrun_multichip).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devs) // n_hosts
    return Mesh(
        np.array(devs).reshape(n_hosts, per_host), ("hosts", "chips")
    )


def landmark_sharding(mesh: Mesh):
    """NamedSharding for landmark-axis arrays (both mesh axes flattened)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(("hosts", "chips")))
