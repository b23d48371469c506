"""Multi-host fake backend: 2 processes × 4 CPU devices == 1 process × 8.

SURVEY.md §4 prescribes multi-process-on-one-host via jax.distributed as the
fake backend the reference never had (it is strictly single-device,
SURVEY.md §2.14b).  Each worker is a real OS process with its own XLA
runtime and gloo cross-process collectives; the 'data' mesh axis spans the
process (DCN) boundary, 'graph' stays within a process (ICI) —
parallel/distributed.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid, nproc, port, nlocal, mode="hybrid"):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port),
         str(nlocal), mode],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=HERE)


def _result(proc, timeout=420):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line:\n{out}\n{err}")


@pytest.mark.slow
def test_two_process_matches_single_process():
    """Loss and grad-sum from a 2-process × 4-device run equal the
    1-process × 8-device run on the identical (2, 4) hybrid mesh
    (VERDICT r1 #3)."""
    port = _free_port()
    workers = [_launch(pid, 2, port, 4) for pid in range(2)]
    single = _launch(0, 1, port, 8)

    res_mp = [_result(w) for w in workers]
    res_1p = _result(single)

    for r in res_mp:
        np.testing.assert_allclose(r["loss"], res_1p["loss"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(r["gradsum"], res_1p["gradsum"],
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["graph_halo", "graph"])
def test_graph_axis_across_processes(mode):
    """The GRAPH axis itself spans the 2-process (DCN-class gloo)
    boundary: the FULL all-compact correspondence model runs on a pure
    ('graph',) mesh of 2×4 devices, so every per-layer collective — the
    boundary-compressed halo all_to_alls (mode=graph_halo) or the full
    all_gathers (mode=graph) — crosses OS processes.  Loss and grad-sum
    must equal the 1-process × 8-device run (VERDICT r4 #2; BASELINE's
    edge-partitioned-across-hosts north star)."""
    port = _free_port()
    workers = [_launch(pid, 2, port, 4, mode) for pid in range(2)]
    single = _launch(0, 1, port, 8, mode)

    res_mp = [_result(w) for w in workers]
    res_1p = _result(single)

    for r in res_mp:
        np.testing.assert_allclose(r["loss"], res_1p["loss"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(r["gradsum"], res_1p["gradsum"],
                                   rtol=1e-5, atol=1e-6)


def test_hybrid_mesh_single_process():
    """make_hybrid_mesh on the 8-virtual-device single process: correct
    shape, axis names, and process-local slice covering the whole batch."""
    import jax

    from fieldconv_tpu.parallel.distributed import (
        make_hybrid_mesh, process_local_batch_slice)

    mesh = make_hybrid_mesh(n_data=2, n_graph=4)
    assert mesh.shape == {"data": 2, "graph": 4}
    assert mesh.axis_names == ("data", "graph")
    sl = process_local_batch_slice(4, mesh)
    assert (sl.start, sl.stop) == (0, 4)
    with pytest.raises(ValueError):
        process_local_batch_slice(3, mesh)
    with pytest.raises(ValueError):
        make_hybrid_mesh(n_data=3, n_graph=4)
