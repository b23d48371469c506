"""Multi-process fake-backend worker (SURVEY.md §4's prescription).

Launched by tests/test_multiprocess.py as N separate OS processes, each with
its own virtual CPU device count — the closest single-machine stand-in for a
multi-host TPU job.  Builds a deterministic graph-parallel classification
case, runs one value_and_grad through the full halo-kernel model on the
hybrid ('data' process-major, 'graph' within-process) mesh, and prints a
JSON fingerprint {loss, gradsum} that must be identical to the
single-process run's.

Usage: python mp_worker.py PROCESS_ID NUM_PROCESSES PORT LOCAL_DEVICES
"""

import json
import os
import sys


def build_case():
    """Deterministic (config, batch, n_classes): same on every process."""
    import numpy as np

    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.trainer import stack_batch
    from test_band_conv import banded_graph, tables_for

    rng = np.random.default_rng(7)
    g = banded_graph(rng, n_vertices=128, tb=8, bw=7)
    table, _ = tables_for(g, tb=8)
    N = table.n_pad
    config = ExperimentConfig(
        task="classification", band_limit=g["B"], n_rings=g["R"], nf=6,
        random_rotate_deg=0.0, random_scale=None)
    n_classes = 5
    items = []
    for i in range(2):
        pos = np.asarray(rng.normal(size=(N, 3)), np.float32)
        items.append((pos, table, np.int32(i % n_classes)))
    batch = stack_batch(items, banded_tb=8, echo_banded=True)
    return config, batch, n_classes


def run(n_data=2, n_graph=4, process_local=True):
    """Build the mesh, run one graph-parallel value_and_grad, return the
    scalar fingerprint.  Callable in-process (single-process baseline) or
    from main() (multi-process)."""
    import jax
    import numpy as np

    from fieldconv_tpu.parallel.distributed import make_hybrid_mesh, place_global
    from fieldconv_tpu.parallel.gp import (
        gp_batch, make_gp_value_and_grad, place_gp_batch)
    from fieldconv_tpu.train.loop import build_model
    from jax.sharding import PartitionSpec as P

    config, batch, n_classes = build_case()
    mesh = make_hybrid_mesh(n_data=n_data, n_graph=n_graph)

    net1 = build_model(config, n_classes)
    params = jax.jit(net1.init)(
        jax.random.key(0), batch.pos[0],
        jax.tree.map(lambda x: x[0], batch.table))
    netg = build_model(config, n_classes, axis_name="graph")

    gpb = place_gp_batch(gp_batch(batch), mesh, process_local=process_local)
    params_g = jax.tree.map(
        lambda x: place_global(np.asarray(x), mesh, P(),
                               process_local=process_local), params)
    vag = make_gp_value_and_grad(netg, config, n_classes, mesh, gpb)
    with mesh:
        loss, grads = jax.jit(vag)(params_g, jax.random.key(42), gpb)
    gradsum = sum(
        float(jax.jit(lambda g: jax.numpy.sum(jax.numpy.abs(g)))(g))
        for g in jax.tree.leaves(grads))
    return {"loss": float(loss), "gradsum": gradsum}


def build_compact_case(halo: bool, n_shards: int):
    """Deterministic ALL-COMPACT correspondence case (same on every
    process): one CompactPanelTable serves every op; halo=True resolves
    the boundary-compressed exchange tables."""
    import numpy as np

    from conftest import random_graph
    from fieldconv_tpu.precomp.banded import (build_compact_panel_table,
                                              halo_compact_shards, kd_order,
                                              reorder_precompute,
                                              shard_compact_table)
    from fieldconv_tpu.precomp.stencil import build_edge_table
    from fieldconv_tpu.train.config import ExperimentConfig

    rng = np.random.default_rng(11)
    B, R, NV = 1, 3, 128
    g = random_graph(rng, n_vertices=NV, avg_deg=5, B=B, R=R, epsilon=0.6)
    pos_full = rng.normal(size=(NV, 3))
    perm = kd_order(pos_full, tb=8)
    edges_r, w, pos_r = reorder_precompute(perm, g["edges"], g["w"],
                                           pos_full)
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w,
                             g["xp"], NV, B, R, 0.6,
                             n_multiple=8 * n_shards)
    compact = build_compact_panel_table(table, tb=8, ts=8)
    cshards = shard_compact_table(compact, n_shards)
    if halo:
        cshards = halo_compact_shards(cshards, h_multiple=4)
    N = table.n_pad
    pos = np.zeros((N, 3), np.float32)
    pos[:table.n_valid] = pos_r[:table.n_valid]
    labels = np.full(N, -1, np.int32)
    labels[:table.n_valid] = rng.integers(0, 7, table.n_valid)
    config = ExperimentConfig(task="correspondence", band_limit=B,
                              n_rings=R, random_rotate_deg=0.0,
                              random_scale=None, echo_impl="compact",
                              conv_impl="compact")
    return config, table, cshards, pos, labels, 7


def run_graph(n_graph: int, halo: bool):
    """Pure ('graph',) mesh over ALL global devices, process-major — when
    launched as 2 OS processes this axis CROSSES the process (DCN-class
    gloo) boundary, so EVERY per-layer collective of the all-compact
    model (the halo all_to_alls, or the full all_gathers) rides the
    cross-process backend.  This is BASELINE's north-star shape:
    edge-partitioned exchange across hosts, not just data-parallel psums.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from fieldconv_tpu.models import CorrespondenceNet
    from fieldconv_tpu.parallel.distributed import place_global
    from fieldconv_tpu.parallel.panel_gp import (
        make_panel_gp_value_and_grad, panel_gp_batch, place_panel_gp_batch)

    config, table, cshards, pos, labels, n_classes = build_compact_case(
        halo, n_graph)
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    mesh = Mesh(np.array(devs), ("graph",))

    net1 = CorrespondenceNet(n_classes=n_classes, nf=6, n_des=4, n_bins=2,
                             band_limit=config.band_limit,
                             n_rings=config.n_rings, dropout=0.0)
    netg = net1.clone(axis_name="graph")
    params = jax.jit(net1.init)(jax.random.key(0), pos, table)
    params_g = jax.tree.map(
        lambda x: place_global(np.asarray(x), mesh, P()), params)

    b = panel_gp_batch(pos, table, labels, None, compact_shards=cshards)
    b = place_panel_gp_batch(b, mesh)
    vag = make_panel_gp_value_and_grad(netg, config, n_classes, mesh, b)
    with mesh:
        loss, grads = jax.jit(vag)(params_g, jax.random.key(42), b)
    gradsum = sum(
        float(jax.jit(lambda g: jax.numpy.sum(jax.numpy.abs(g)))(g))
        for g in jax.tree.leaves(grads))
    return {"loss": float(loss), "gradsum": gradsum}


def main():
    pid, nproc, port, nlocal = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], int(sys.argv[4]))
    mode = sys.argv[5] if len(sys.argv) > 5 else "hybrid"
    os.environ["JAX_PLATFORMS"] = "cpu"
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)

    import jax

    # env alone is not enough when a TPU platform plugin is installed; the
    # config update wins (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", nlocal)

    from fieldconv_tpu.parallel import distributed

    if nproc > 1:
        ok = distributed.initialize(f"localhost:{port}", nproc, pid)
        assert ok and jax.process_count() == nproc, (
            f"distributed init failed: process_count={jax.process_count()}")

    if mode in ("graph", "graph_halo"):
        out = run_graph(n_graph=len(jax.devices()),
                        halo=mode == "graph_halo")
    else:
        out = run(n_data=nproc if nproc > 1 else 2,
                  n_graph=len(jax.devices()) // (nproc if nproc > 1 else 2),
                  process_local=nproc > 1)
    print("RESULT " + json.dumps({"pid": pid, **out}), flush=True)


if __name__ == "__main__":
    main()
