import os

# Force a virtual 8-device CPU platform before jax initialises, so sharding
# tests run anywhere (SURVEY.md §4's fake backend).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# jax may already be imported by pytest plugins (jaxtyping) before this
# conftest runs; the backend is still uninitialised at that point, so forcing
# the platform through the config (which re-reads XLA_FLAGS at first use)
# still works.
import jax

jax.config.update("jax_platforms", "cpu")

import shutil
import subprocess

import numpy as np
import pytest

# Build the native geometry core once per session so tests/test_native.py
# runs instead of green-skipping on a clean checkout.  No compiler → the
# skip marker stays honest; a FAILED build with a compiler present is a
# loud error, not a skip.
_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "fieldconv_tpu", "geometry", "csrc")
if not os.path.exists(os.path.join(_CSRC, "libgeomcore.so")):
    if shutil.which(os.environ.get("CXX", "g++")) and shutil.which("make"):
        subprocess.run(["make", "-C", _CSRC], check=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, n_vertices=37, avg_deg=9, B=2, R=6, epsilon=0.35):
    """Random ragged support-graph data mimicking computeLogXPort outputs."""
    N = n_vertices
    edges = []
    for i in range(N):
        deg = rng.integers(1, 2 * avg_deg)
        srcs = rng.choice(N, size=deg, replace=False)
        for j in srcs:
            edges.append((j, i))
    edges = np.array(edges, dtype=np.int64)
    E = len(edges)
    log_mag = rng.uniform(0.0, 1.4 * epsilon, E)   # some beyond support
    log_ang = rng.uniform(-np.pi, np.pi, E)
    w = rng.uniform(0.1, 1.0, N)
    xp = np.exp(1j * rng.uniform(-np.pi, np.pi, E))
    return dict(
        edges=edges, log_mag=log_mag, log_ang=log_ang, w=w, xp=xp,
        n_vertices=N, B=B, R=R, epsilon=epsilon,
    )


def random_field(rng, n, c, zero_frac=0.15):
    """Random complex features with a sprinkle of exact zeros (origin tests)."""
    z = rng.normal(size=(n, c)) + 1j * rng.normal(size=(n, c))
    mask = rng.uniform(size=(n, c)) < zero_frac
    z[mask] = 0.0
    return z
