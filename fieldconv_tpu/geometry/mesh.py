"""Discrete surface operators on triangle meshes (host-side, numpy/scipy).

Replaces the geometry-central dependency of the reference's native module
(fcutils/src/main.cpp:26-31, which wraps halfedge meshes + intrinsic
Laplacians).  Everything here is re-entrant — no global state.

Conventions:
  * vertices: (n, 3) float64; faces: (m, 3) int64, counter-clockwise.
  * Tangent plane at vertex i: neighbors ordered counter-clockwise, edge
    angular coordinates are cumulative corner angles rescaled by 2π/Θ_i
    (π/Θ_i on the boundary) — the standard intrinsic vertex frame used by
    the Vector Heat Method (Sharp et al. 2019, §5).
  * Complex numbers encode tangent vectors in these frames.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


class TriMesh:
    """Triangle mesh with cached intrinsic operators."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.v = np.asarray(vertices, dtype=np.float64)
        self.f = np.asarray(faces, dtype=np.int64)
        if self.f.ndim != 2 or self.f.shape[1] != 3:
            raise ValueError("faces must be (m, 3)")
        self.n = self.v.shape[0]
        self.m = self.f.shape[0]
        self._cache = {}
        self._build_connectivity()
        self._build_frames()

    # --- connectivity -----------------------------------------------------

    def _build_connectivity(self):
        f = self.f
        # directed halfedges (3m, 2): (a,b), (b,c), (c,a) per face
        he = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
        self.halfedges = he
        self.he_face = np.tile(np.arange(self.m), 3)
        # opposite vertex of each halfedge (the third face vertex)
        self.he_opp_vertex = np.concatenate([f[:, 2], f[:, 0], f[:, 1]])

        # map (i, j) -> halfedge id
        key = he[:, 0] * self.n + he[:, 1]
        if len(np.unique(key)) != len(key):
            raise ValueError("non-manifold mesh: duplicated directed edge")
        self._he_index = dict(zip(key.tolist(), range(len(key))))

        # twin halfedge (j, i); -1 if boundary
        twin_key = he[:, 1] * self.n + he[:, 0]
        self.he_twin = np.array(
            [self._he_index.get(int(k), -1) for k in twin_key], dtype=np.int64
        )
        self.is_boundary_vertex = np.zeros(self.n, dtype=bool)
        b = self.he_twin < 0
        self.is_boundary_vertex[he[b, 0]] = True
        self.is_boundary_vertex[he[b, 1]] = True

    # --- geometry ---------------------------------------------------------

    def edge_vectors(self):
        """(3m, 3) embedded vector of each halfedge."""
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
        """(3m,) interior angle at the tail vertex of each halfedge.

        Halfedge h = (i, j) belongs to face (i, j, k); the corner angle at i
        is between edges (i→j) and (i→k).
        """
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
        ev = self.edge_vectors()
        return float(np.mean(np.linalg.norm(ev, axis=1)))

    # --- vertex frames ----------------------------------------------------

    def _build_frames(self):
        """Order neighbors CCW around each vertex and assign normalised
        angular coordinates to each outgoing halfedge."""
        n = self.n
        he = self.halfedges
        corner = None  # computed below lazily via corner_angles

        # next CCW outgoing halfedge: (i,j) -> (i,k) within face (i,j,k)
        nxt = {}
        for h in range(len(he)):
            i = int(he[h, 0])
            k = int(self.he_opp_vertex[h])
            nxt[(i, int(he[h, 1]))] = (i, k)

        # Traversal start: a CCW walk around vertex i must begin at the
        # outgoing halfedge with no CW predecessor.  (i, j) has a CW
        # predecessor iff its twin (j, i) exists, so boundary vertices start
        # at their twin-less outgoing halfedge.
        walk_start = {}
        for h in np.nonzero(self.he_twin < 0)[0]:
            walk_start[int(he[h, 0])] = int(he[h, 1])

        outgoing = [dict() for _ in range(n)]
        for h in range(len(he)):
            outgoing[int(he[h, 0])][int(he[h, 1])] = h

        corner = self.corner_angles()
        theta = np.zeros(len(he))
        angle_sum = np.zeros(n)
        order = [[] for _ in range(n)]
        for i in range(n):
            outs = outgoing[i]
            if not outs:
                continue
            j0 = walk_start.get(i, next(iter(outs)))
            # walk CCW
            seq = []
            j = j0
            for _ in range(len(outs) + 1):
                seq.append(j)
                h = outs[j]
                k = int(self.he_opp_vertex[h])
                if k == j0 and i not in walk_start:
                    break
                if k not in outs:
                    break
                j = k
            order[i] = seq
            # cumulative corner angles along the walk
            cum = 0.0
            for p, j in enumerate(seq):
                h = outs[j]
                theta[h] = cum
                cum += corner[h]
            angle_sum[i] = cum

        # normalise to 2π (interior) / π (boundary)
        self.vertex_angle_sum = angle_sum
        scale = np.where(self.is_boundary_vertex, np.pi, 2 * np.pi) / np.maximum(
            angle_sum, 1e-300
        )
        self.he_angle = theta * scale[he[:, 0]]
        self.neighbor_order = order
        self._outgoing = outgoing

    def halfedge_id(self, i: int, j: int) -> int:
        return self._he_index[i * self.n + j]

    # --- operators --------------------------------------------------------

    def cotan_laplacian(self) -> sp.csr_matrix:
        """Weak cotan Laplacian L (positive semi-definite, L = D - W)."""
        if "L" in self._cache:
            return self._cache["L"]
        he = self.halfedges
        corner = self.corner_angles()
        # halfedge (i,j) in face (i,j,k): the angle opposite to edge (j,k)
        # is at i.  cot weight of edge (j,k) accumulates cot(angle at i)/2.
        i_idx, j_idx = [], []
        vals = []
        a, b = he[:, 1], self.he_opp_vertex  # edge (j, k) opposite the corner
        cot = 1.0 / np.tan(np.clip(corner, 1e-12, np.pi - 1e-12))
        w = 0.5 * cot
        rows = np.concatenate([a, b, a, b])
        cols = np.concatenate([b, a, a, b])
        data = np.concatenate([-w, -w, w, w])
        L = sp.csr_matrix((data, (rows, cols)), shape=(self.n, self.n))
        self._cache["L"] = L
        return L

    def lumped_mass(self) -> np.ndarray:
        """Barycentric lumped vertex mass (area/3 per incident face)."""
        if "mass" in self._cache:
            return self._cache["mass"]
        areas = self.face_areas()
        mass = np.zeros(self.n)
        for c in range(3):
            np.add.at(mass, self.f[:, c], areas / 3.0)
        self._cache["mass"] = mass
        return mass

    def edge_rotations(self):
        """Per-halfedge frame rotation r_ij = e^{iρ} carrying tangent vectors
        from the head vertex frame to the tail vertex frame.

        For halfedge h = (i, j): a vector expressed in j's frame, transported
        across edge ij into i's frame, is multiplied by
        rot[h] = e^{i(θ_i(ij) + π − θ_j(ji))}.
        """
        if "rot" in self._cache:
            return self._cache["rot"]
        he = self.halfedges
        rot = np.zeros(len(he), dtype=np.complex128)
        for h in range(len(he)):
            twin = self.he_twin[h]
            if twin >= 0:
                ang_ji = self.he_angle[twin]
            else:
                # boundary edge: direction (head -> tail) is the CCW end of
                # the head vertex's wedge, which normalises to exactly π
                ang_ji = np.pi
            rho = self.he_angle[h] + np.pi - ang_ji
            rot[h] = np.exp(1j * rho)
        self._cache["rot"] = rot
        return rot

    def connection_laplacian(self) -> sp.csr_matrix:
        """Complex vertex connection Laplacian with cotan weights.

        L∇_ii = Σ_j w_ij,  L∇_ij = −w_ij·r_ij  (Hermitian PSD; VHM §5.2).
        """
        if "Lconn" in self._cache:
            return self._cache["Lconn"]
        he = self.halfedges
        corner = self.corner_angles()
        cot = 1.0 / np.tan(np.clip(corner, 1e-12, np.pi - 1e-12))
        # cot weight contribution for edge (j, k) from the corner at i
        w_half = 0.5 * cot
        a, b = he[:, 1], self.he_opp_vertex

        # accumulate symmetric cot weights per directed pair
        w = {}
        for e in range(len(a)):
            w[(int(a[e]), int(b[e]))] = w.get((int(a[e]), int(b[e])), 0.0) + w_half[e]
            w[(int(b[e]), int(a[e]))] = w.get((int(b[e]), int(a[e])), 0.0) + w_half[e]

        rot = self.edge_rotations()
        rows, cols, vals = [], [], []
        diag = np.zeros(self.n, dtype=np.complex128)
        for h in range(len(he)):
            i, j = int(he[h, 0]), int(he[h, 1])
            if i > j and self.he_twin[h] >= 0:
                continue  # handle each undirected edge once via (i<j) or boundary
            wij = w[(i, j)]
            r_ij = rot[h]
            rows += [i, j]
            cols += [j, i]
            vals += [-wij * r_ij, -wij * np.conj(r_ij)]
            diag[i] += wij
            diag[j] += wij
        rows += list(range(self.n))
        cols += list(range(self.n))
        vals += list(diag)
        Lc = sp.csr_matrix(
            (np.array(vals), (np.array(rows), np.array(cols))),
            shape=(self.n, self.n),
            dtype=np.complex128,
        )
        self._cache["Lconn"] = Lc
        return Lc
