"""Multi-host initialization (SURVEY §5 'Distributed communication backend').

On a pod slice each host runs the same program; `initialize()` brings up the
JAX distributed runtime, and `global_mesh()` builds the single
``('devices',)`` mesh over every chip in the slice. The scene pytree is
replicated host-locally (each host builds identical arrays from the same
scene file -- no broadcast needed because scene compilation is
deterministic); film and gradient reductions ride XLA collectives over
ICI/DCN. Untestable on this single-chip environment; exercised via the
virtual CPU mesh in tests/test_dist.py.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize passthrough (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """One 'devices' axis over all chips in the slice (all hosts)."""
    return Mesh(np.asarray(jax.devices()), ("devices",))


def local_lane_slice(n_lanes: int):
    """The [start, stop) lane range this host owns under even sharding."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = -(-n_lanes // n_proc)
    return pid * per, min((pid + 1) * per, n_lanes)
