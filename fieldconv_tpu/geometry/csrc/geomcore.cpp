// geomcore — self-contained native geometry core for fieldconv_tpu.
//
// Replaces the reference's geometry-central dependency (fcutils/src/main.cpp
// wraps it with mutable global state; this library is re-entrant and
// dependency-free).  Exposes a C API consumed via ctypes
// (fieldconv_tpu/geometry/native.py).
//
// Scope:
//   * gc_mesh_build  — halfedge connectivity, intrinsic vertex frames
//     (angle-normalised wedges), corner angles, cotan weights, lumped mass,
//     frame-to-frame edge rotations.  O(V+F); the hot assembly that is
//     Python-loop-bound in geometry/mesh.py at 100k+ vertices.
//   * gc_cg_solve / gc_cg_solve_complex — Jacobi-preconditioned conjugate
//     gradients on CSR systems (SPD / Hermitian-PD), multi-RHS.  The
//     default pipeline uses scipy's sparse LU for speed; this keeps the
//     native library self-sufficient.
//
// Build: make -C fieldconv_tpu/geometry/csrc   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

using std::int64_t;
using cplx = std::complex<double>;

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

}  // namespace

extern "C" {

// Builds halfedge connectivity and intrinsic frames.
//
// Inputs:  pos (n,3) float64; faces (m,3) int64 (CCW).
// Outputs (caller-allocated):
//   he          (3m, 2) int64   — directed halfedges, face-major
//                                 [(a,b) of every face, then (b,c), then (c,a)]
//   he_twin     (3m,)   int64   — twin halfedge id or -1
//   he_angle    (3m,)   float64 — angular coordinate of the halfedge in its
//                                 tail vertex's normalised frame
//   corner      (3m,)   float64 — interior angle at the tail vertex
//   cot_half    (3m,)   float64 — 0.5 * cot(corner)  (cotan weight share of
//                                 the edge opposite the corner)
//   rot_re/im   (3m,)   float64 — e^{i(θ_tail + π − θ_head)} frame rotation
//   boundary    (n,)    uint8
//   angle_sum   (n,)    float64
//   mass        (n,)    float64 — barycentric lumped mass
// Returns 0 on success, nonzero on non-manifold input.
int gc_mesh_build(const double* pos, int64_t n, const int64_t* faces, int64_t m,
                  int64_t* he, int64_t* he_twin, double* he_angle,
                  double* corner, double* cot_half, double* rot_re,
                  double* rot_im, uint8_t* boundary, double* angle_sum,
                  double* mass) {
  const int64_t H = 3 * m;
  std::vector<V3> v(n);
  for (int64_t i = 0; i < n; i++) v[i] = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};

  // halfedges face-major: block 0: (f0,f1); block 1: (f1,f2); block 2: (f2,f0)
  std::vector<int64_t> opp(H);
  for (int64_t f = 0; f < m; f++) {
    int64_t a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    he[2 * (f)] = a;            he[2 * (f) + 1] = b;            opp[f] = c;
    he[2 * (m + f)] = b;        he[2 * (m + f) + 1] = c;        opp[m + f] = a;
    he[2 * (2 * m + f)] = c;    he[2 * (2 * m + f) + 1] = a;    opp[2 * m + f] = b;
  }

  std::unordered_map<int64_t, int64_t> index;
  index.reserve(2 * H);
  for (int64_t h = 0; h < H; h++) {
    int64_t key = he[2 * h] * n + he[2 * h + 1];
    auto r = index.emplace(key, h);
    if (!r.second) return 1;  // duplicated directed edge: non-manifold
  }
  for (int64_t h = 0; h < H; h++) {
    auto it = index.find(he[2 * h + 1] * n + he[2 * h]);
    he_twin[h] = (it == index.end()) ? -1 : it->second;
  }

  std::memset(boundary, 0, n);
  for (int64_t h = 0; h < H; h++)
    if (he_twin[h] < 0) {
      boundary[he[2 * h]] = 1;
      boundary[he[2 * h + 1]] = 1;
    }

  // corner angles + cotan halves + mass
  std::memset(mass, 0, sizeof(double) * n);
  for (int64_t h = 0; h < H; h++) {
    int64_t i = he[2 * h], j = he[2 * h + 1], k = opp[h];
    V3 u = sub(v[j], v[i]);
    V3 w = sub(v[k], v[i]);
    double cu = norm(u), cw = norm(w);
    double ca = dot(u, w) / std::max(cu * cw, 1e-300);
    ca = std::min(1.0, std::max(-1.0, ca));
    corner[h] = std::acos(ca);
    double ang = std::min(M_PI - 1e-12, std::max(1e-12, corner[h]));
    cot_half[h] = 0.5 / std::tan(ang);
  }
  for (int64_t f = 0; f < m; f++) {
    int64_t a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    double area = 0.5 * norm(cross(sub(v[b], v[a]), sub(v[c], v[a])));
    mass[a] += area / 3.0;
    mass[b] += area / 3.0;
    mass[c] += area / 3.0;
  }

  // outgoing adjacency (vertex -> (head, halfedge))
  std::vector<int64_t> out_off(n + 1, 0);
  for (int64_t h = 0; h < H; h++) out_off[he[2 * h] + 1]++;
  for (int64_t i = 0; i < n; i++) out_off[i + 1] += out_off[i];
  std::vector<int64_t> out_he(H);
  {
    std::vector<int64_t> cur(out_off.begin(), out_off.end() - 1);
    for (int64_t h = 0; h < H; h++) out_he[cur[he[2 * h]]++] = h;
  }

  // CCW walk per vertex: start at the outgoing halfedge with missing twin
  // (boundary) or anywhere (interior); next_ccw (i,j) -> (i,k) with k the
  // opposite vertex of halfedge (i,j).
  for (int64_t i = 0; i < n; i++) {
    int64_t deg = out_off[i + 1] - out_off[i];
    if (deg == 0) {
      angle_sum[i] = 0.0;
      continue;
    }
    // map head -> halfedge for this vertex
    int64_t start_h = out_he[out_off[i]];
    for (int64_t s = out_off[i]; s < out_off[i + 1]; s++) {
      if (he_twin[out_he[s]] < 0) {
        start_h = out_he[s];
        break;
      }
    }
    double cum = 0.0;
    int64_t h = start_h;
    for (int64_t step = 0; step < deg; step++) {
      he_angle[h] = cum;
      cum += corner[h];
      int64_t k = opp[h];
      auto it = index.find(i * n + k);
      if (it == index.end()) break;  // hit boundary end of the wedge
      h = it->second;
      if (h == start_h) break;
    }
    angle_sum[i] = cum;
  }

  // normalise frames: 2π interior, π boundary
  std::vector<double> scale(n);
  for (int64_t i = 0; i < n; i++) {
    double target = boundary[i] ? M_PI : 2.0 * M_PI;
    scale[i] = target / std::max(angle_sum[i], 1e-300);
  }
  for (int64_t h = 0; h < H; h++) he_angle[h] *= scale[he[2 * h]];

  // frame rotations across edges
  for (int64_t h = 0; h < H; h++) {
    double ang_ji = (he_twin[h] >= 0) ? he_angle[he_twin[h]] : M_PI;
    double rho = he_angle[h] + M_PI - ang_ji;
    rot_re[h] = std::cos(rho);
    rot_im[h] = std::sin(rho);
  }
  return 0;
}

// Jacobi-preconditioned CG on a CSR SPD system, multi-RHS.
// A: indptr (n+1), indices (nnz), data (nnz).  b/x: (n, nrhs) column-major
// per-RHS contiguous? -> row-major (n rows, nrhs cols) with lda = nrhs.
// Returns max iterations used across RHS (or -1 if any failed to converge).
int gc_cg_solve(const int64_t* indptr, const int64_t* indices,
                const double* data, int64_t n, const double* b, double* x,
                int64_t nrhs, double tol, int64_t maxiter) {
  std::vector<double> diag(n);
  for (int64_t i = 0; i < n; i++) {
    diag[i] = 1e-300;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; p++)
      if (indices[p] == i) diag[i] = data[p];
  }
  int worst = 0;
  std::vector<double> r(n), z(n), p(n), ap(n), xi(n);
  for (int64_t c = 0; c < nrhs; c++) {
    double bnorm = 0.0;
    for (int64_t i = 0; i < n; i++) {
      xi[i] = 0.0;
      r[i] = b[i * nrhs + c];
      bnorm += r[i] * r[i];
    }
    bnorm = std::sqrt(bnorm);
    if (bnorm < 1e-300) {
      for (int64_t i = 0; i < n; i++) x[i * nrhs + c] = 0.0;
      continue;
    }
    for (int64_t i = 0; i < n; i++) z[i] = r[i] / diag[i];
    p = z;
    double rz = 0.0;
    for (int64_t i = 0; i < n; i++) rz += r[i] * z[i];
    int64_t it = 0;
    for (; it < maxiter; it++) {
      for (int64_t i = 0; i < n; i++) {
        double s = 0.0;
        for (int64_t q = indptr[i]; q < indptr[i + 1]; q++)
          s += data[q] * p[indices[q]];
        ap[i] = s;
      }
      double pap = 0.0;
      for (int64_t i = 0; i < n; i++) pap += p[i] * ap[i];
      double alpha = rz / std::max(pap, 1e-300);
      double rnorm = 0.0;
      for (int64_t i = 0; i < n; i++) {
        xi[i] += alpha * p[i];
        r[i] -= alpha * ap[i];
        rnorm += r[i] * r[i];
      }
      if (std::sqrt(rnorm) < tol * bnorm) break;
      double rz_new = 0.0;
      for (int64_t i = 0; i < n; i++) {
        z[i] = r[i] / diag[i];
        rz_new += r[i] * z[i];
      }
      double beta = rz_new / std::max(rz, 1e-300);
      rz = rz_new;
      for (int64_t i = 0; i < n; i++) p[i] = z[i] + beta * p[i];
    }
    if (it >= maxiter) worst = -1;
    if (worst >= 0) worst = std::max<int64_t>(worst, it);
    for (int64_t i = 0; i < n; i++) x[i * nrhs + c] = xi[i];
  }
  return worst;
}

// Hermitian-PD complex CG (planar re/im arrays), multi-RHS.
int gc_cg_solve_complex(const int64_t* indptr, const int64_t* indices,
                        const double* data_re, const double* data_im,
                        int64_t n, const double* b_re, const double* b_im,
                        double* x_re, double* x_im, int64_t nrhs, double tol,
                        int64_t maxiter) {
  std::vector<double> diag(n);
  for (int64_t i = 0; i < n; i++) {
    diag[i] = 1e-300;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; p++)
      if (indices[p] == i) diag[i] = data_re[p];
  }
  int worst = 0;
  std::vector<cplx> r(n), z(n), p(n), ap(n), xi(n);
  for (int64_t c = 0; c < nrhs; c++) {
    double bnorm = 0.0;
    for (int64_t i = 0; i < n; i++) {
      xi[i] = 0.0;
      r[i] = cplx(b_re[i * nrhs + c], b_im[i * nrhs + c]);
      bnorm += std::norm(r[i]);
    }
    bnorm = std::sqrt(bnorm);
    if (bnorm < 1e-300) {
      for (int64_t i = 0; i < n; i++) {
        x_re[i * nrhs + c] = 0.0;
        x_im[i * nrhs + c] = 0.0;
      }
      continue;
    }
    for (int64_t i = 0; i < n; i++) z[i] = r[i] / diag[i];
    p = z;
    cplx rz = 0.0;
    for (int64_t i = 0; i < n; i++) rz += std::conj(r[i]) * z[i];
    int64_t it = 0;
    for (; it < maxiter; it++) {
      for (int64_t i = 0; i < n; i++) {
        cplx s = 0.0;
        for (int64_t q = indptr[i]; q < indptr[i + 1]; q++)
          s += cplx(data_re[q], data_im[q]) * p[indices[q]];
        ap[i] = s;
      }
      cplx pap = 0.0;
      for (int64_t i = 0; i < n; i++) pap += std::conj(p[i]) * ap[i];
      cplx alpha = rz / pap;
      double rnorm = 0.0;
      for (int64_t i = 0; i < n; i++) {
        xi[i] += alpha * p[i];
        r[i] -= alpha * ap[i];
        rnorm += std::norm(r[i]);
      }
      if (std::sqrt(rnorm) < tol * bnorm) break;
      cplx rz_new = 0.0;
      for (int64_t i = 0; i < n; i++) {
        z[i] = r[i] / diag[i];
        rz_new += std::conj(r[i]) * z[i];
      }
      cplx beta = rz_new / rz;
      rz = rz_new;
      for (int64_t i = 0; i < n; i++) p[i] = z[i] + beta * p[i];
    }
    if (it >= maxiter) worst = -1;
    for (int64_t i = 0; i < n; i++) {
      x_re[i * nrhs + c] = xi[i].real();
      x_im[i * nrhs + c] = xi[i].imag();
    }
  }
  return worst;
}

// Farthest-point sampling: picks n_samples indices, writes them (unsorted)
// into out.  Deterministic given `start`.
void gc_fps(const double* pos, int64_t n, int64_t n_samples, int64_t start,
            int64_t* out) {
  std::vector<double> d2(n);
  V3 s{pos[3 * start], pos[3 * start + 1], pos[3 * start + 2]};
  for (int64_t i = 0; i < n; i++) {
    V3 p{pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
    V3 d = sub(p, s);
    d2[i] = dot(d, d);
  }
  out[0] = start;
  for (int64_t k = 1; k < n_samples; k++) {
    int64_t best = 0;
    for (int64_t i = 1; i < n; i++)
      if (d2[i] > d2[best]) best = i;
    out[k] = best;
    V3 q{pos[3 * best], pos[3 * best + 1], pos[3 * best + 2]};
    for (int64_t i = 0; i < n; i++) {
      V3 p{pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
      V3 d = sub(p, q);
      double nd = dot(d, d);
      if (nd < d2[i]) d2[i] = nd;
    }
  }
}

}  // extern "C"
