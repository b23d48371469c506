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


def main():
    pid, nproc, port, nlocal = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], int(sys.argv[4]))
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

    out = run(n_data=nproc if nproc > 1 else 2,
              n_graph=len(jax.devices()) // (nproc if nproc > 1 else 2),
              process_local=nproc > 1)
    print("RESULT " + json.dumps({"pid": pid, **out}), flush=True)


if __name__ == "__main__":
    main()
