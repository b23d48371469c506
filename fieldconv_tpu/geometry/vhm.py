"""Vector Heat Method solver (Sharp, Soliman, Crane 2019).

Replaces geometry-central's VectorHeatMethodSolver / HeatMethodDistanceSolver
used by the reference native module (fcutils/src/main.cpp:59-92, 99-130).
Re-entrant, and — unlike the reference, which runs one pair of sparse solves
per sampled vertex serially — all sources are solved *batched* against the
prefactorised operators (one sparse factorisation per mesh, multi-RHS
triangular solves), which is the dominant offline-precompute win.

Algorithms:
  * parallel transport: connection-Laplacian heat flow of the source frame
    vector, normalised per vertex (VHM §5; transportTangentVectors).
  * geodesic distance: the heat method (Crane et al. 2013) — scalar heat
    flow, normalised negative gradient, Poisson solve on its divergence.
  * log map: direction = arg(radial field) − arg(horizontal field) where
    the horizontal field is the transported basis vector (VHM §8.2); the
    radial field is the smoothed intrinsic gradient of the distance, with
    exact wedge angles on the source 1-ring; magnitude = heat-method
    distance.
  * extend_scalar: ratio of diffused value to diffused indicator (VHM §3.2,
    used by fcutils `weights`/`nearest` with tCoef=1e-4).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .mesh import TriMesh


class VectorHeatSolver:
    def __init__(self, mesh: TriMesh, t_coef: float = 1.0):
        self.mesh = mesh
        h2 = mesh.mean_edge_length() ** 2
        self.t = t_coef * h2
        n = mesh.n

        L = mesh.cotan_laplacian()
        M = mesh.lumped_mass()
        Lc = mesh.connection_laplacian()
        self.M = M

        # operators are factorised LAZILY on first use: callers that only
        # diffuse (e.g. the integration-weights step, fcutils `weights`)
        # never pay for the connection/Poisson factorisations
        self._heat_op = (sp.diags(M) + self.t * L).tocsc()
        self._conn_op = (sp.diags(M).astype(np.complex128) + self.t * Lc).tocsc()
        # Poisson operator for the distance step; shift to make it PD.
        self._poisson_op = (L + 1e-9 * sp.diags(np.maximum(M, 1e-12))).tocsc()
        self._L = L
        # wider connection diffusion used to smooth lattice-scale ripple out
        # of radial direction fields (see log_map)
        self._conn_smooth_op = (
            sp.diags(M).astype(np.complex128) + 4.0 * self.t * Lc
        ).tocsc()
        self._facts: dict = {}

        # face geometry for gradient/divergence
        f, v = mesh.f, mesh.v
        self._areas = mesh.face_areas()
        e0 = v[f[:, 2]] - v[f[:, 1]]   # opposite vertex 0
        e1 = v[f[:, 0]] - v[f[:, 2]]   # opposite vertex 1
        e2 = v[f[:, 1]] - v[f[:, 0]]   # opposite vertex 2
        nrm = np.cross(e2, -e1)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-300)
        self._face_normal = nrm
        self._opp_edges = (e0, e1, e2)

    def _fact(self, name):
        if name not in self._facts:
            self._facts[name] = spla.factorized(getattr(self, f"_{name}_op"))
        return self._facts[name]

    @property
    def _heat(self):
        return self._fact("heat")

    @property
    def _conn(self):
        return self._fact("conn")

    @property
    def _poisson(self):
        return self._fact("poisson")

    @property
    def _conn_smooth(self):
        return self._fact("conn_smooth")

    # --- scalar heat flow --------------------------------------------------

    def diffuse(self, rhs: np.ndarray) -> np.ndarray:
        """(M + tL)^{-1} rhs; rhs may be (n,) or (n, S)."""
        return self._heat(rhs)

    def extend_scalar(self, points: np.ndarray, values: np.ndarray) -> np.ndarray:
        """Nearest-interpolate `values` at `points` over the surface via the
        short-time diffusion ratio (VHM §3.2; fcutils main.cpp:134-176 uses
        this with tCoef=1e-4 to snap vertices to geodesically-nearest samples).
        """
        n = self.mesh.n
        num = np.zeros(n)
        den = np.zeros(n)
        np.add.at(num, points, values.astype(np.float64))
        np.add.at(den, points, 1.0)
        u = self.diffuse(num)
        phi = self.diffuse(den)
        with np.errstate(divide="ignore", invalid="ignore"):
            return u / np.where(np.abs(phi) < 1e-300, 1e-300, phi)

    # --- geodesic distance (heat method) ------------------------------------

    def distance(self, sources: np.ndarray) -> np.ndarray:
        """Geodesic distance fields from each source vertex.

        sources: (S,) int. Returns (n, S) float64, zero at each source.
        """
        mesh = self.mesh
        sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
        n, S = mesh.n, len(sources)
        rhs = np.zeros((n, S))
        rhs[sources, np.arange(S)] = 1.0
        u = self.diffuse(rhs)                                 # (n, S)

        f = mesh.f
        A = self._areas[:, None]
        N = self._face_normal
        e0, e1, e2 = self._opp_edges
        # per-face gradient of u: (m, 3, S)
        grad = (
            np.cross(N, e0)[:, :, None] * u[f[:, 0], None, :]
            + np.cross(N, e1)[:, :, None] * u[f[:, 1], None, :]
            + np.cross(N, e2)[:, :, None] * u[f[:, 2], None, :]
        ) / (2.0 * A[..., None])
        gn = np.linalg.norm(grad, axis=1, keepdims=True)
        X = -grad / np.maximum(gn, 1e-300)                    # (m, 3, S)

        # integrated divergence at vertices
        corner = mesh.corner_angles().reshape(3, mesh.m).T    # (m, 3) per corner
        cot = 1.0 / np.tan(np.clip(corner, 1e-12, np.pi - 1e-12))
        div = np.zeros((n, S))
        # at vertex f[:,c]: (1/2)[cot(angle at c1)·(e_towards_c2 ... ] standard:
        # div_i = 1/2 Σ_faces cotθ1 (e1·X) + cotθ2 (e2·X) with e1, e2 the two
        # edges of the face leaving i and θ the angles opposite to them.
        v = mesh.v
        for c in range(3):
            i = f[:, c]
            j = f[:, (c + 1) % 3]
            k = f[:, (c + 2) % 3]
            eij = v[j] - v[i]
            eik = v[k] - v[i]
            # angle opposite edge (i,j) is at k  -> corner column (c+2)%3
            # angle opposite edge (i,k) is at j  -> corner column (c+1)%3
            cot_k = cot[:, (c + 2) % 3][:, None]
            cot_j = cot[:, (c + 1) % 3][:, None]
            contrib = 0.5 * (
                cot_k * np.einsum("md,mds->ms", eij, X)
                + cot_j * np.einsum("md,mds->ms", eik, X)
            )
            np.add.at(div, i, contrib)

        # L here is the positive-semidefinite (−Δ) operator, so Δd = ∇·X
        # becomes L d = −div.
        dist = self._poisson(-div)
        dist = dist - dist[sources, np.arange(S)][None, :]
        return dist

    # --- vector heat flow ---------------------------------------------------

    def transport(self, sources: np.ndarray) -> np.ndarray:
        """Parallel transport of each source's basis vector e1.

        Returns (n, S) complex128: column s holds e^{iφ_{s→·}} — the unit
        vector at every vertex representing source s's frame direction
        (fcutils precomputeLogXP's `connection`, main.cpp:67).
        """
        mesh = self.mesh
        sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
        n, S = mesh.n, len(sources)
        rhs = np.zeros((n, S), dtype=np.complex128)
        rhs[sources, np.arange(S)] = 1.0 + 0.0j
        Y = self._conn(rhs)
        mag = np.abs(Y)
        return Y / np.maximum(mag, 1e-300)

    def _intrinsic_gradient(self, scalar: np.ndarray) -> np.ndarray:
        """Per-vertex intrinsic gradient of scalar fields, as complex numbers
        in each vertex's tangent frame.

        Weighted least squares over the 1-ring: for neighbor z of y,
        s(z) − s(y) ≈ Re( conj(g_y) · e_z ) with e_z = |yz|·e^{iθ_yz}.
        scalar: (n, S).  Returns (n, S) complex128.
        """
        mesh = self.mesh
        if not hasattr(self, "_lsq_ops"):
            # Precompute the per-vertex 2x2 normal-equation inverse and the
            # neighbor difference operator (one row per outgoing halfedge).
            he = mesh.halfedges
            rows, cols = he[:, 0], he[:, 1]
            lens = np.linalg.norm(mesh.v[cols] - mesh.v[rows], axis=1)
            ex = lens * np.cos(mesh.he_angle)
            ey = lens * np.sin(mesh.he_angle)
            w = 1.0 / np.maximum(ex**2 + ey**2, 1e-300)  # inverse-length² weight
            # normal matrix entries per vertex
            a11 = np.zeros(mesh.n); a12 = np.zeros(mesh.n); a22 = np.zeros(mesh.n)
            np.add.at(a11, rows, w * ex * ex)
            np.add.at(a12, rows, w * ex * ey)
            np.add.at(a22, rows, w * ey * ey)
            det = np.maximum(a11 * a22 - a12 * a12, 1e-300)
            self._lsq_ops = (rows, cols, ex, ey, w, a11, a12, a22, det)
        rows, cols, ex, ey, w, a11, a12, a22, det = self._lsq_ops

        diff = scalar[cols] - scalar[rows]                 # (nnz, S)
        bx = np.zeros_like(scalar)
        by = np.zeros_like(scalar)
        np.add.at(bx, rows, (w * ex)[:, None] * diff)
        np.add.at(by, rows, (w * ey)[:, None] * diff)
        gx = (a22[:, None] * bx - a12[:, None] * by) / det[:, None]
        gy = (a11[:, None] * by - a12[:, None] * bx) / det[:, None]
        return gx + 1j * gy

    def log_map(self, sources: np.ndarray):
        """Logarithmic maps from each source.

        Returns (r, theta): both (n, S) float64 — polar coordinates of
        log_s(·) expressed in source s's tangent frame (the quantity fcutils
        stores per support edge, main.cpp:71,84-88).

        Direction: the radial (outward) field is the per-vertex intrinsic
        gradient of the heat-method distance, smoothed by one wide
        connection-diffusion step to remove the lattice-scale anisotropy of
        the screened-Poisson kernel; the angle is read off against the
        transported horizontal frame field (arg R − arg H).  On the source
        1-ring the discrete log direction is known exactly (the wedge angle
        of the outgoing edge) and overrides the solve.
        Magnitude: heat-method distance.
        """
        mesh = self.mesh
        srcs = np.atleast_1d(np.asarray(sources, dtype=np.int64))
        S = len(srcs)

        H = self.transport(srcs)
        r = np.abs(self.distance(srcs))

        g = self._intrinsic_gradient(r)
        g = self._conn_smooth(self.M[:, None] * g)
        R = g / np.maximum(np.abs(g), 1e-300)
        theta = np.angle(R * np.conj(H))

        # exact near field: log_x(j) direction for 1-ring neighbors j is the
        # intrinsic angle of halfedge (x → j)
        cols = np.arange(S)
        for s, src in enumerate(srcs):
            hs = mesh.outgoing_halfedges(int(src))
            theta[mesh.halfedges[hs, 1], s] = mesh.he_angle[hs]
        theta[srcs, cols] = 0.0
        r[srcs, cols] = 0.0
        return r, theta
