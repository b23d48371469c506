"""Discrete surface operators on triangle meshes (host-side).

Replaces the geometry-central dependency of the reference's native module
(fcutils/src/main.cpp:26-31).  Connectivity and intrinsic frames are
assembled by the native core (geometry/csrc/geomcore.cpp via ctypes) when
built, with a pure-Python fallback; all operators are exposed as vectorized
numpy/scipy objects.  Everything is re-entrant — no global state.

Conventions:
  * vertices: (n, 3) float64; faces: (m, 3) int64, counter-clockwise.
  * Tangent plane at vertex i: neighbors ordered counter-clockwise, edge
    angular coordinates are cumulative corner angles rescaled by 2π/Θ_i
    (π/Θ_i on the boundary) — the intrinsic vertex frames of the Vector
    Heat Method (Sharp et al. 2019, §5).
  * Complex numbers encode tangent vectors in these frames.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from . import native


class TriMesh:
    """Triangle mesh with cached intrinsic operators.

    Exposed arrays (all face-major halfedge order — blocks (a,b),(b,c),(c,a)):
      halfedges (3m, 2), he_twin (3m,), he_angle (3m,), corner (3m,),
      cot_half (3m,), he_rot (3m,) complex, he_opp_vertex (3m,),
      is_boundary_vertex (n,), vertex_angle_sum (n,).
    """

    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 use_native: bool = True):
        self.v = np.asarray(vertices, dtype=np.float64)
        self.f = np.asarray(faces, dtype=np.int64)
        if self.f.ndim != 2 or self.f.shape[1] != 3:
            raise ValueError("faces must be (m, 3)")
        self.n = self.v.shape[0]
        self.m = self.f.shape[0]
        self._cache: dict = {}

        f = self.f
        self.he_opp_vertex = np.concatenate([f[:, 2], f[:, 0], f[:, 1]])

        built = native.mesh_build(self.v, self.f) if use_native else None
        if built is not None:
            self.halfedges = built["he"]
            self.he_twin = built["he_twin"]
            self.he_angle = built["he_angle"]
            self._cache["corner"] = built["corner"]
            self.cot_half = built["cot_half"]
            self.he_rot = built["rot_re"] + 1j * built["rot_im"]
            self.is_boundary_vertex = built["boundary"].astype(bool)
            self.vertex_angle_sum = built["angle_sum"]
            self._cache["mass"] = built["mass"]
        else:
            self._py_build()

        # outgoing-halfedge CSR (tail-sorted) for 1-ring queries
        order = np.argsort(self.halfedges[:, 0], kind="stable")
        self.out_he = order
        self.out_off = np.searchsorted(
            self.halfedges[order, 0], np.arange(self.n + 1)
        )

    # --- pure-Python fallback assembly ------------------------------------

    def _py_build(self):
        n, m = self.n, self.m
        f = self.f
        he = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
        self.halfedges = he
        key = he[:, 0] * n + he[:, 1]
        if len(np.unique(key)) != len(key):
            raise ValueError("non-manifold mesh: duplicated directed edge")
        index = dict(zip(key.tolist(), range(len(key))))
        twin_key = he[:, 1] * n + he[:, 0]
        self.he_twin = np.array(
            [index.get(int(k), -1) for k in twin_key], dtype=np.int64
        )
        self.is_boundary_vertex = np.zeros(n, dtype=bool)
        b = self.he_twin < 0
        self.is_boundary_vertex[he[b, 0]] = True
        self.is_boundary_vertex[he[b, 1]] = True

        corner = self.corner_angles()
        self.cot_half = 0.5 / np.tan(np.clip(corner, 1e-12, np.pi - 1e-12))

        outgoing = [dict() for _ in range(n)]
        for h in range(len(he)):
            outgoing[int(he[h, 0])][int(he[h, 1])] = h
        walk_start = {}
        for h in np.nonzero(b)[0]:
            walk_start[int(he[h, 0])] = int(he[h, 1])

        theta = np.zeros(len(he))
        angle_sum = np.zeros(n)
        for i in range(n):
            outs = outgoing[i]
            if not outs:
                continue
            j0 = walk_start.get(i, next(iter(outs)))
            j = j0
            cum = 0.0
            for _ in range(len(outs)):
                h = outs[j]
                theta[h] = cum
                cum += corner[h]
                k = int(self.he_opp_vertex[h])
                if (k == j0 and i not in walk_start) or k not in outs:
                    break
                j = k
            angle_sum[i] = cum
        self.vertex_angle_sum = angle_sum
        scale = np.where(self.is_boundary_vertex, np.pi, 2 * np.pi) / np.maximum(
            angle_sum, 1e-300
        )
        self.he_angle = theta * scale[he[:, 0]]

        ang_ji = np.where(self.he_twin >= 0, self.he_angle[self.he_twin], np.pi)
        self.he_rot = np.exp(1j * (self.he_angle + np.pi - ang_ji))

    # --- geometry ---------------------------------------------------------

    def edge_vectors(self):
        he = self.halfedges
        return self.v[he[:, 1]] - self.v[he[:, 0]]

    def face_areas(self):
        if "areas" not in self._cache:
            e1 = self.v[self.f[:, 1]] - self.v[self.f[:, 0]]
            e2 = self.v[self.f[:, 2]] - self.v[self.f[:, 0]]
            self._cache["areas"] = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
        return self._cache["areas"]

    def surface_area(self) -> float:
        """Total area (reference fcutils main.cpp:185-196)."""
        return float(self.face_areas().sum())

    def corner_angles(self):
        """(3m,) interior angle at the tail vertex of each halfedge."""
        if "corner" in self._cache:
            return self._cache["corner"]
        he = self.halfedges
        u = self.v[he[:, 1]] - self.v[he[:, 0]]
        w = self.v[self.he_opp_vertex] - self.v[he[:, 0]]
        cu = np.linalg.norm(u, axis=1)
        cw = np.linalg.norm(w, axis=1)
        cosang = np.clip(
            np.einsum("ij,ij->i", u, w) / np.maximum(cu * cw, 1e-300), -1.0, 1.0
        )
        self._cache["corner"] = np.arccos(cosang)
        return self._cache["corner"]

    def mean_edge_length(self) -> float:
        return float(np.mean(np.linalg.norm(self.edge_vectors(), axis=1)))

    def outgoing_halfedges(self, i: int) -> np.ndarray:
        """Halfedge ids leaving vertex i."""
        return self.out_he[self.out_off[i]: self.out_off[i + 1]]

    # --- operators --------------------------------------------------------

    def _edge_weights(self):
        """Symmetric cotan weight of each halfedge's own edge.

        For halfedge h = (i, j) in face-major block blk, the corner opposite
        edge (i, j) sits at the halfedge ((blk+2)%3)·m + f; interior edges
        add the twin-side corner too.
        """
        if "w_edge" in self._cache:
            return self._cache["w_edge"]
        m = self.m
        H = 3 * m
        idx = np.arange(H)
        blk, fidx = idx // m, idx % m
        prev2 = ((blk + 2) % 3) * m + fidx
        w_own = self.cot_half[prev2]
        w = w_own + np.where(self.he_twin >= 0, w_own[self.he_twin], 0.0)
        self._cache["w_edge"] = w
        return w

    def cotan_laplacian(self) -> sp.csr_matrix:
        """Weak cotan Laplacian L (positive semi-definite, L = D − W)."""
        if "L" in self._cache:
            return self._cache["L"]
        he = self.halfedges
        w = self._edge_weights()
        bmask = self.he_twin < 0
        rows = np.concatenate([he[:, 0], he[bmask, 1]])
        cols = np.concatenate([he[:, 1], he[bmask, 0]])
        vals = np.concatenate([-w, -w[bmask]])
        drow = np.concatenate([he[:, 0], he[bmask, 1]])
        dval = np.concatenate([w, w[bmask]])
        rows = np.concatenate([rows, drow])
        cols = np.concatenate([cols, drow])
        vals = np.concatenate([vals, dval])
        L = sp.csr_matrix((vals, (rows, cols)), shape=(self.n, self.n))
        self._cache["L"] = L
        return L

    def lumped_mass(self) -> np.ndarray:
        """Barycentric lumped vertex mass (area/3 per incident face)."""
        if "mass" not in self._cache:
            areas = self.face_areas()
            mass = np.zeros(self.n)
            for c in range(3):
                np.add.at(mass, self.f[:, c], areas / 3.0)
            self._cache["mass"] = mass
        return self._cache["mass"]

    def edge_rotations(self):
        """Per-halfedge frame rotation r_ij = e^{iρ} carrying tangent vectors
        from the head vertex frame into the tail vertex frame."""
        return self.he_rot

    def connection_laplacian(self) -> sp.csr_matrix:
        """Complex vertex connection Laplacian with cotan weights.

        L∇_ii = Σ_j w_ij,  L∇_ij = −w_ij·r_ij  (Hermitian PSD; VHM §5.2).
        """
        if "Lconn" in self._cache:
            return self._cache["Lconn"]
        he = self.halfedges
        w = self._edge_weights()
        rot = self.he_rot
        bmask = self.he_twin < 0
        rows = np.concatenate([he[:, 0], he[bmask, 1]])
        cols = np.concatenate([he[:, 1], he[bmask, 0]])
        vals = np.concatenate([-w * rot, -w[bmask] * np.conj(rot[bmask])])
        drow = np.concatenate([he[:, 0], he[bmask, 1]])
        dval = np.concatenate([w, w[bmask]]).astype(np.complex128)
        rows = np.concatenate([rows, drow])
        cols = np.concatenate([cols, drow])
        vals = np.concatenate([vals, dval])
        Lc = sp.csr_matrix(
            (vals, (rows, cols)), shape=(self.n, self.n), dtype=np.complex128
        )
        self._cache["Lconn"] = Lc
        return Lc
