"""Multi-host bootstrap: jax.distributed initialization + hybrid DCN×ICI mesh.

The reference is strictly single-device (SURVEY.md §2.14b); this layer is
new design per BASELINE.md's 2-host north star.  Axis layout policy:

  * ``data``  — the outer, pure-DP axis.  It is laid out PROCESS-MAJOR so
    that when the job spans hosts, data-parallel gradient psums are the only
    collectives that ride DCN.
  * ``graph`` — the vertex-partition axis (halo ppermutes every layer).  It
    is kept WITHIN a process's local devices so halo exchange rides ICI.

The fake multi-host backend for tests (SURVEY.md §4): N processes on one
machine, each with a virtual CPU device count, gloo collectives —
``tests/test_multiprocess.py`` launches 2×4 and asserts loss/grad parity
with the single-process run.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ENV_COORD = "FIELDCONV_COORDINATOR"
_ENV_NPROC = "FIELDCONV_NUM_PROCESSES"
_ENV_PID = "FIELDCONV_PROCESS_ID"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Initialize jax.distributed from args or environment.

    Environment fallbacks: FIELDCONV_COORDINATOR / FIELDCONV_NUM_PROCESSES /
    FIELDCONV_PROCESS_ID (jax's own cluster autodetection still applies when
    none are set and initialize() is called with no arguments on a managed
    cluster).  Returns True if a multi-process runtime was initialized.

    On the CPU backend (the test fake-backend), cross-process collectives
    need the gloo implementation — selected automatically here.
    """
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])
    if coordinator_address is None:
        return False
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # option renamed/absent: non-CPU backends do not need it
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_hybrid_mesh(n_data: Optional[int] = None,
                     n_graph: Optional[int] = None) -> Mesh:
    """('data', 'graph') mesh over all global devices, data axis
    process-major (DCN), graph axis within-process (ICI).

    Defaults: n_graph = local device count (graph parallel within each
    host), n_data = total/n_graph.  n_graph must divide the per-process
    device count or the graph axis would straddle the DCN boundary.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_local = len(jax.local_devices())
    total = len(devs)
    if n_graph is None:
        n_graph = n_local if n_data is None else total // n_data
    if n_data is None:
        n_data = total // n_graph
    if n_data * n_graph != total:
        raise ValueError(f"mesh {n_data}x{n_graph} != {total} devices")
    if jax.process_count() > 1 and n_local % n_graph != 0:
        raise ValueError(
            f"graph axis ({n_graph}) must divide the per-process device "
            f"count ({n_local}) so halo exchange stays on ICI")
    arr = np.array(devs).reshape(n_data, n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def process_local_batch_slice(n_items: int, mesh: Mesh) -> slice:
    """Which rows of the global batch this process must materialize when
    feeding with place_global(process_local=True): the contiguous data-axis
    rows owned by this process's devices."""
    n_data = mesh.shape["data"]
    if n_items % n_data:
        raise ValueError(f"batch {n_items} not divisible by data axis {n_data}")
    per = n_items // n_data
    me = jax.process_index()
    rows = [i for i in range(mesh.devices.shape[0])
            if any(d.process_index == me for d in mesh.devices[i])]
    if not rows:
        return slice(0, 0)
    lo, hi = min(rows), max(rows) + 1
    assert rows == list(range(lo, hi)), "data rows of a process must be contiguous"
    return slice(lo * per, hi * per)


def place_global(x: np.ndarray, mesh: Mesh, spec: P,
                 process_local: bool = False):
    """Put host data onto a (possibly multi-process) mesh.

    process_local=False: every process passes the identical FULL array
    (jax scatters the addressable shards).  True: each process passes only
    its own data-axis rows (jax.make_array_from_process_local_data) — the
    process-local loading path, so hosts never materialize remote meshes.
    """
    sharding = NamedSharding(mesh, spec)
    if process_local and jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(jax.numpy.asarray(x), sharding)
