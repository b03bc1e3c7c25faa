// multimesh_tpu native host runtime: batched mesh kernels (C++17 + OpenMP).
//
// Host-side counterpart of the device (JAX/Pallas) compute path, used as
//  * an independent validation oracle for the core numerics, and
//  * a fast host fallback when no accelerator is present.
//
// Where the reference ships two single-purpose C files (an OpenMP centroid
// kernel and a hex-8-only early-exit trilinear locator,
// reference multi_mesh/src/centroid.c and src/trilinearinterpolator.c),
// this runtime is a small batched library: arbitrary-order tensor GLL
// basis evaluation, general Newton inverse of the shape map, and a
// candidate-scan point locator with the same acceptance semantics as the
// device engine (first-accept in candidate order, best-so-far fallback,
// snap clipping, sentinel).  All entry points are extern "C" and operate
// on caller-allocated flat arrays so ctypes binding is trivial.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxOrder = 8;   // up to (8+1)^3 = 729 nodes per element
constexpr int kMaxNodes1D = kMaxOrder + 1;

// ---------------------------------------------------------------------
// GLL nodes (closed forms for p <= 4, Newton on (1-x^2)P'_p otherwise)
// ---------------------------------------------------------------------
void legendre_pair(int p, double x, double* pp, double* pm) {
  double p0 = 1.0, p1 = x;
  for (int k = 2; k <= p; ++k) {
    double p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k;
    p0 = p1;
    p1 = p2;
  }
  *pp = (p >= 1) ? p1 : 1.0;
  *pm = p0;
}

void gll_nodes(int p, double* x) {
  const double s37 = std::sqrt(3.0 / 7.0);
  const double s15 = std::sqrt(1.0 / 5.0);
  switch (p) {
    case 1: x[0] = -1; x[1] = 1; return;
    case 2: x[0] = -1; x[1] = 0; x[2] = 1; return;
    case 3: x[0] = -1; x[1] = -s15; x[2] = s15; x[3] = 1; return;
    case 4: x[0] = -1; x[1] = -s37; x[2] = 0; x[3] = s37; x[4] = 1; return;
    default: break;
  }
  for (int i = 0; i <= p; ++i)
    x[i] = -std::cos(M_PI * i / p);
  for (int iter = 0; iter < 100; ++iter) {
    double max_step = 0.0;
    for (int i = 1; i < p; ++i) {
      double pp, pm;
      legendre_pair(p, x[i], &pp, &pm);
      double f = p * (pm - x[i] * pp);          // (1-x^2) P'_p
      double df = -p * (p + 1) * pp;            // its derivative
      double step = f / df;
      x[i] -= step;
      max_step = std::max(max_step, std::fabs(step));
    }
    if (max_step < 1e-15) break;
  }
}

struct Basis1D {
  int n;                       // p + 1
  double nodes[kMaxNodes1D];
  double bary[kMaxNodes1D];    // barycentric weights

  explicit Basis1D(int order) : n(order + 1) {
    gll_nodes(order, nodes);
    for (int i = 0; i < n; ++i) {
      double w = 1.0;
      for (int j = 0; j < n; ++j)
        if (j != i) w *= (nodes[i] - nodes[j]);
      bary[i] = 1.0 / w;
    }
  }

  // product-form cardinal values: exact 0/1 at the nodes
  void eval(double x, double* l) const {
    for (int i = 0; i < n; ++i) {
      double prod = bary[i];
      for (int j = 0; j < n; ++j)
        if (j != i) prod *= (x - nodes[j]);
      l[i] = prod;
    }
  }

  void eval_deriv(double x, double* dl) const {
    for (int i = 0; i < n; ++i) {
      double total = 0.0;
      for (int k = 0; k < n; ++k) {
        if (k == i) continue;
        double prod = 1.0;
        for (int j = 0; j < n; ++j)
          if (j != i && j != k) prod *= (x - nodes[j]);
        total += prod;
      }
      dl[i] = bary[i] * total;
    }
  }
};

// tensor basis at ref (canonical row-major node order, dim 2 or 3)
void tensor_basis(const Basis1D& b, const double* ref, int dim, double* out) {
  double l0[kMaxNodes1D], l1[kMaxNodes1D], l2[kMaxNodes1D];
  b.eval(ref[0], l0);
  b.eval(ref[1], l1);
  if (dim == 3) {
    b.eval(ref[2], l2);
    int idx = 0;
    for (int i = 0; i < b.n; ++i)
      for (int j = 0; j < b.n; ++j)
        for (int k = 0; k < b.n; ++k) out[idx++] = l0[i] * l1[j] * l2[k];
  } else {
    int idx = 0;
    for (int i = 0; i < b.n; ++i)
      for (int j = 0; j < b.n; ++j) out[idx++] = l0[i] * l1[j];
  }
}

// 3x3 solve via adjugate; returns false on singular
bool solve3(const double a[3][3], const double r[3], double x[3]) {
  double c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1];
  double c01 = a[0][2] * a[2][1] - a[0][1] * a[2][2];
  double c02 = a[0][1] * a[1][2] - a[0][2] * a[1][1];
  double c10 = a[1][2] * a[2][0] - a[1][0] * a[2][2];
  double c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0];
  double c12 = a[0][2] * a[1][0] - a[0][0] * a[1][2];
  double c20 = a[1][0] * a[2][1] - a[1][1] * a[2][0];
  double c21 = a[0][1] * a[2][0] - a[0][0] * a[2][1];
  double c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0];
  double det = a[0][0] * c00 + a[0][1] * c10 + a[0][2] * c20;
  if (det == 0.0 || !std::isfinite(det)) return false;
  double inv = 1.0 / det;
  x[0] = (c00 * r[0] + c01 * r[1] + c02 * r[2]) * inv;
  x[1] = (c10 * r[0] + c11 * r[1] + c12 * r[2]) * inv;
  x[2] = (c20 * r[0] + c21 * r[1] + c22 * r[2]) * inv;
  return true;
}

bool solve2(const double a[2][2], const double r[2], double x[2]) {
  double det = a[0][0] * a[1][1] - a[0][1] * a[1][0];
  if (det == 0.0 || !std::isfinite(det)) return false;
  x[0] = (a[1][1] * r[0] - a[0][1] * r[1]) / det;
  x[1] = (a[0][0] * r[1] - a[1][0] * r[0]) / det;
  return true;
}

// Newton inverse of the full-order shape map on one element.
// nodes: [(p+1)^dim, dim] canonical order.  Returns convergence flag.
bool newton_inverse(const Basis1D& b, const double* nodes, int dim,
                    const double* point, int max_iter, double rtol,
                    double* ref) {
  const int nn = (dim == 3) ? b.n * b.n * b.n : b.n * b.n;
  // element scale from the node AABB
  double lo[3], hi[3];
  for (int d = 0; d < dim; ++d) { lo[d] = 1e300; hi[d] = -1e300; }
  for (int m = 0; m < nn; ++m)
    for (int d = 0; d < dim; ++d) {
      lo[d] = std::min(lo[d], nodes[m * dim + d]);
      hi[d] = std::max(hi[d], nodes[m * dim + d]);
    }
  double scale = 0.0;
  for (int d = 0; d < dim; ++d) scale = std::max(scale, hi[d] - lo[d]);
  double tol = rtol * std::max(scale, 1e-300);

  double l[3][kMaxNodes1D], dl[3][kMaxNodes1D];

  for (int d = 0; d < dim; ++d) ref[d] = 0.0;
  for (int it = 0; it < max_iter; ++it) {
    for (int d = 0; d < dim; ++d) {
      b.eval(ref[d], l[d]);
      b.eval_deriv(ref[d], dl[d]);
    }
    // x(ref) and Jacobian dx/dref accumulated in one node sweep
    double x[3] = {0, 0, 0};
    double jac[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
    if (dim == 3) {
      int m = 0;
      for (int i = 0; i < b.n; ++i)
        for (int j = 0; j < b.n; ++j)
          for (int k = 0; k < b.n; ++k, ++m) {
            double N = l[0][i] * l[1][j] * l[2][k];
            double g0 = dl[0][i] * l[1][j] * l[2][k];
            double g1 = l[0][i] * dl[1][j] * l[2][k];
            double g2 = l[0][i] * l[1][j] * dl[2][k];
            for (int d = 0; d < 3; ++d) {
              double nd = nodes[m * 3 + d];
              x[d] += N * nd;
              jac[d][0] += g0 * nd;
              jac[d][1] += g1 * nd;
              jac[d][2] += g2 * nd;
            }
          }
    } else {
      int m = 0;
      for (int i = 0; i < b.n; ++i)
        for (int j = 0; j < b.n; ++j, ++m) {
          double N = l[0][i] * l[1][j];
          double g0 = dl[0][i] * l[1][j];
          double g1 = l[0][i] * dl[1][j];
          for (int d = 0; d < 2; ++d) {
            double nd = nodes[m * 2 + d];
            x[d] += N * nd;
            jac[d][0] += g0 * nd;
            jac[d][1] += g1 * nd;
          }
        }
    }
    double resid[3] = {0, 0, 0};
    double rmax = 0.0;
    for (int d = 0; d < dim; ++d) {
      resid[d] = point[d] - x[d];
      rmax = std::max(rmax, std::fabs(resid[d]));
    }
    if (rmax < tol) return true;
    double step[3];
    bool ok;
    if (dim == 3) {
      ok = solve3(jac, resid, step);
    } else {
      double a2[2][2] = {{jac[0][0], jac[0][1]}, {jac[1][0], jac[1][1]}};
      ok = solve2(a2, resid, step);
    }
    if (!ok) return false;
    for (int d = 0; d < dim; ++d) {
      ref[d] += step[d];
      if (ref[d] > 8.0) ref[d] = 8.0;
      if (ref[d] < -8.0) ref[d] = -8.0;
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Element centroids: mean of connected nodes.
// connectivity [nelem, nodes_per_elem] (int64), points [npoints, ndim],
// out [nelem, ndim].
void mmt_centroids(int64_t nelem, int64_t nodes_per_elem, int64_t ndim,
                   const int64_t* connectivity, const double* points,
                   double* out) {
#pragma omp parallel for
  for (int64_t e = 0; e < nelem; ++e) {
    for (int64_t d = 0; d < ndim; ++d) {
      double acc = 0.0;
      for (int64_t k = 0; k < nodes_per_elem; ++k)
        acc += points[connectivity[e * nodes_per_elem + k] * ndim + d];
      out[e * ndim + d] = acc / nodes_per_elem;
    }
  }
}

// Tensor GLL basis weights at reference coordinates.
// ref [n, dim] -> out [n, (order+1)^dim]
void mmt_gll_basis(int64_t n, int32_t order, int32_t dim, const double* ref,
                   double* out) {
  if (order < 1 || order > kMaxOrder) return;  // bindings validate loudly
  Basis1D b(order);
  int64_t nn = 1;
  for (int d = 0; d < dim; ++d) nn *= b.n;
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i)
    tensor_basis(b, ref + i * dim, dim, out + i * nn);
}

// Batched Newton inverse map.
// elem_nodes [n, (order+1)^dim, dim], points [n, dim]
// -> refs [n, dim], converged [n]
void mmt_inverse_map(int64_t n, int32_t order, int32_t dim,
                     const double* elem_nodes, const double* points,
                     int32_t max_iter, double rtol, double* refs,
                     uint8_t* converged) {
  if (order < 1 || order > kMaxOrder) {
    std::memset(converged, 0, n);  // bindings validate loudly
    return;
  }
  Basis1D b(order);
  int64_t nn = 1;
  for (int d = 0; d < dim; ++d) nn *= b.n;
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    converged[i] = newton_inverse(b, elem_nodes + i * nn * dim, dim,
                                  points + i * dim, max_iter, rtol,
                                  refs + i * dim)
                       ? 1
                       : 0;
  }
}

// Candidate-scan point locator with device-engine semantics.
// points [npts, dim]; candidates [npts, k] element ids into
// all_nodes [nelem, (order+1)^dim, dim].  Fallback modes:
//   0 = sentinel (-1, zero weights), 1 = snap (clip best ref to
//   +/- snap_clip), 2 = best (unclipped best if max|ref| < fallback_max).
// Outputs: elements [npts], refs [npts, dim], weights [npts, (p+1)^dim].
// Returns the number of points left unlocated.
int64_t mmt_locate(int64_t npts, int64_t k, int64_t nelem, int32_t order,
                   int32_t dim, const double* points,
                   const int64_t* candidates, const double* all_nodes,
                   double accept_tol, int32_t fallback_mode,
                   double snap_clip, double fallback_max, int32_t max_iter,
                   double rtol, int64_t* elements, double* refs,
                   double* weights) {
  if (order < 1 || order > kMaxOrder) return -1;  // bindings validate loudly
  Basis1D b(order);
  int64_t nn = 1;
  for (int d = 0; d < dim; ++d) nn *= b.n;
  int64_t failed = 0;

#pragma omp parallel for reduction(+ : failed)
  for (int64_t i = 0; i < npts; ++i) {
    const double* pt = points + i * dim;
    double best_max = 1e300;
    double best_ref[3] = {0, 0, 0};
    int64_t best_elem = candidates[i * k];
    bool accepted = false;

    for (int64_t c = 0; c < k && !accepted; ++c) {
      int64_t e = candidates[i * k + c];
      double ref[3];
      if (!newton_inverse(b, all_nodes + e * nn * dim, dim, pt, max_iter,
                          rtol, ref))
        continue;
      double m = 0.0;
      for (int d = 0; d < dim; ++d) m = std::max(m, std::fabs(ref[d]));
      if (m < best_max) {
        best_max = m;
        best_elem = e;
        for (int d = 0; d < dim; ++d) best_ref[d] = ref[d];
      }
      if (m < accept_tol) {
        elements[i] = e;
        for (int d = 0; d < dim; ++d) refs[i * dim + d] = ref[d];
        tensor_basis(b, ref, dim, weights + i * nn);
        accepted = true;
      }
    }
    if (accepted) continue;

    bool assigned = false;
    if (fallback_mode == 1) {  // snap
      for (int d = 0; d < dim; ++d) {
        double v = best_ref[d];
        if (v > snap_clip) v = snap_clip;
        if (v < -snap_clip) v = -snap_clip;
        refs[i * dim + d] = v;
      }
      elements[i] = best_elem;
      tensor_basis(b, refs + i * dim, dim, weights + i * nn);
      assigned = true;
    } else if (fallback_mode == 2 && best_max < fallback_max) {  // best
      elements[i] = best_elem;
      for (int d = 0; d < dim; ++d) refs[i * dim + d] = best_ref[d];
      tensor_basis(b, best_ref, dim, weights + i * nn);
      assigned = true;
    }
    if (!assigned) {
      elements[i] = -1;
      for (int d = 0; d < dim; ++d) refs[i * dim + d] = 0.0;
      std::memset(weights + i * nn, 0, nn * sizeof(double));
      failed += 1;
    }
  }
  return failed;
}

}  // extern "C"
