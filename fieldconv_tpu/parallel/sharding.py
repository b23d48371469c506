"""Multi-chip sharding: data-parallel over meshes, graph-parallel over
vertices.

The reference has no distributed code at all (SURVEY.md §2.14b); this layer
is new design.  The natural axes for this workload:

  * ``data``  — independent meshes of a batch (pure DP; gradients psum).
  * ``graph`` — the vertex/edge partition of each mesh (the mesh analog of
    sequence/context parallelism, SURVEY.md §5.7).  Target-vertex rows of
    the padded CSR table are block-sharded; the feature gather across the
    partition boundary is the halo exchange, which XLA GSPMD lowers to
    collectives on ICI.

Round-1 implementation: GSPMD annotation (NamedSharding on batch inputs +
replicated params, jit does the rest).  A hand-scheduled shard_map/Pallas
halo pipeline is the later optimisation on the same layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..precomp.edge_table import EdgeTable
from ..train.trainer import MeshBatch


def make_device_mesh(n_data: int, n_graph: int, devices: Optional[Sequence] = None):
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_graph != len(devices):
        raise ValueError(f"mesh {n_data}x{n_graph} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def shard_batch(batch: MeshBatch, mesh: Mesh) -> MeshBatch:
    """Place a host MeshBatch onto the device mesh: batch axis over 'data',
    target-vertex axis over 'graph'."""
    dg = NamedSharding(mesh, P("data", "graph"))

    def put(x, s):
        return jax.device_put(jax.numpy.asarray(x), s)

    t = batch.table
    table = EdgeTable(
        src=put(t.src, dg), mask=put(t.mask, dg), rsten=put(t.rsten, dg),
        fwxp=put(t.fwxp, dg), ln=put(t.ln, dg), wxp=put(t.wxp, dg),
        vmask=put(t.vmask, dg),
        n_valid=t.n_valid, band_limit=t.band_limit, n_rings=t.n_rings,
    )
    labels_sh = dg if batch.labels.ndim > 1 else NamedSharding(mesh, P("data"))
    return MeshBatch(
        pos=put(batch.pos, dg), table=table, labels=put(batch.labels, labels_sh)
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / opt state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
