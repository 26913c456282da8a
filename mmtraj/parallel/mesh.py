"""Device-mesh data parallelism (BASELINE.json:11; SURVEY.md §2.6/§2.7).

The reference is single-process single-device; the one first-class scale-out
strategy here is SPMD data parallelism: a 1-D mesh over the chips of a
v4-8/v5e-8, batch dimension sharded over the ``data`` axis, parameters and
optimizer state replicated.  XLA inserts the gradient all-reduce (`psum`) over
ICI automatically from the sharding annotations — no hand-written collectives
needed at this model scale.

TP/PP/SP/EP are deliberately out of scope (SURVEY.md §2.6): the model is <1M
params and sequences are 20 steps; the scaling axes are batch and padded agent
count, both handled by DP + masking.  Multi-host extends by calling
`jax.distributed.initialize()` before `make_mesh()` — the sharding code is
unchanged and the gradient collectives then ride ICI within hosts and DCN
across, with nothing to match in the reference (it has no distributed path).

Tests exercise this exact module on a virtual 8-device CPU mesh
(tests/conftest.py); the driver's `dryrun_multichip` does the same.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: call before make_mesh() on each host.

    Single-host runs never need this.  On a multi-host slice,
    `jax.distributed.initialize` discovers peers (args auto-detected on Cloud
    TPU; pass coordinator 'host:port' + num_processes/process_id elsewhere —
    e.g. the 2-process CPU smoke test, tests/test_multihost.py), after which
    jax.devices() spans the slice and the same 1-D mesh/sharding code scales
    over ICI+DCN (SURVEY.md §2.7 — the reference has no distributed path to
    match)."""
    import jax.distributed

    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, n: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) local devices."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a pytree of batch arrays with the leading dim sharded."""
    return jax.device_put(batch, batch_sharding(mesh))
