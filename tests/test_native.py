"""Native geometry core (libgeomcore.so) vs the pure-Python path."""

import numpy as np
import pytest
import scipy.sparse as sp

from fieldconv_tpu.data.synthetic import grid_mesh, icosphere
from fieldconv_tpu.geometry import native
from fieldconv_tpu.geometry.mesh import TriMesh

needs_native = pytest.mark.skipif(
    not native.available(), reason="libgeomcore.so not built"
)


@needs_native
@pytest.mark.parametrize("mesh_fn", [
    lambda: grid_mesh(10, 10, jitter=0.01, seed=1),
    lambda: icosphere(subdiv=2),
])
def test_native_matches_python(mesh_fn):
    v, f = mesh_fn()
    a = TriMesh(v, f, use_native=True)
    b = TriMesh(v, f, use_native=False)

    np.testing.assert_array_equal(a.halfedges, b.halfedges)
    np.testing.assert_array_equal(a.he_twin, b.he_twin)
    np.testing.assert_array_equal(a.is_boundary_vertex, b.is_boundary_vertex)
    np.testing.assert_allclose(a.he_angle, b.he_angle, atol=1e-12)
    np.testing.assert_allclose(a.corner_angles(), b.corner_angles(), atol=1e-12)
    np.testing.assert_allclose(a.he_rot, b.he_rot, atol=1e-12)
    np.testing.assert_allclose(a.lumped_mass(), b.lumped_mass(), atol=1e-12)
    np.testing.assert_allclose(
        np.abs(a.cotan_laplacian() - b.cotan_laplacian()).max(), 0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.abs(a.connection_laplacian() - b.connection_laplacian()).max(),
        0, atol=1e-10,
    )


@needs_native
def test_native_cg_real_and_complex():
    v, f = icosphere(subdiv=2)
    mesh = TriMesh(v, f)
    L = mesh.cotan_laplacian()
    M = mesh.lumped_mass()
    A = (sp.diags(M) + 0.01 * L).tocsr()
    rng = np.random.default_rng(0)
    b = rng.normal(size=(mesh.n, 3))
    x = native.cg_solve(A, b, tol=1e-12)
    np.testing.assert_allclose(A @ x, b, atol=1e-8)

    Lc = mesh.connection_laplacian()
    Ac = (sp.diags(M).astype(complex) + 0.01 * Lc).tocsr()
    bc = rng.normal(size=(mesh.n, 2)) + 1j * rng.normal(size=(mesh.n, 2))
    xc = native.cg_solve_complex(Ac, bc, tol=1e-12)
    np.testing.assert_allclose(Ac @ xc, bc, atol=1e-8)


@needs_native
def test_native_fps_matches_python():
    from fieldconv_tpu.geometry.sampling import farthest_point_sampling

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3))
    a = np.sort(native.fps(pts, 40))
    b = farthest_point_sampling(pts, 40)
    np.testing.assert_array_equal(a, b)
