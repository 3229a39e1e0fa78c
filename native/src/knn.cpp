/* Exact k-nearest-neighbour queries over a uniform grid.
 *
 * Replaces the reference's two CUDA KNN dependencies with a multithreaded
 * host implementation (the TPU stays free for rendering):
 *   - simple_knn `distCUDA2` (mean sq. distance to 3 NN, used once at init
 *     to seed log-scales — scene/saro_gaussian.py:187-189),
 *   - mmcv.ops.knn (nearest-neighbour isolation ranking in the point-cloud
 *     sparsifier — helper_model.py:150-166).
 *
 * Algorithm: bucket points into a uniform grid whose cell size targets a
 * constant occupancy, sort point indices by cell, then per query expand
 * rings of cells outward until the k-th best distance is provably inside
 * the searched radius.  Exact for any input (degenerate clouds fall back to
 * wider rings), O(n) memory, parallel over queries with OpenMP.
 */
#include "saro_native.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Grid {
  float lo[3];
  float cell;     // cell edge length
  int dims[3];    // number of cells per axis
  std::vector<int64_t> order;   // point indices sorted by cell id
  std::vector<int64_t> starts;  // cell id -> range in `order`

  int64_t cell_id(int cx, int cy, int cz) const {
    return ((int64_t)cz * dims[1] + cy) * dims[0] + cx;
  }
  int coord(const float *p, int axis) const {
    int c = (int)((p[axis] - lo[axis]) / cell);
    return std::min(std::max(c, 0), dims[axis] - 1);
  }
};

Grid build_grid(const float *pts, int64_t n) {
  Grid g;
  float hi[3];
  for (int a = 0; a < 3; ++a) {
    g.lo[a] = std::numeric_limits<float>::max();
    hi[a] = std::numeric_limits<float>::lowest();
  }
  for (int64_t i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) {
      g.lo[a] = std::min(g.lo[a], pts[i * 3 + a]);
      hi[a] = std::max(hi[a], pts[i * 3 + a]);
    }
  // target ~2 points per cell: cell = (volume * 2 / n)^(1/3)
  double ext[3], vol = 1.0;
  for (int a = 0; a < 3; ++a) {
    ext[a] = std::max((double)hi[a] - g.lo[a], 1e-9);
    vol *= ext[a];
  }
  double cell = std::cbrt(vol * 2.0 / std::max<int64_t>(n, 1));
  // cap total cells at min(8M, 4n): bounds memory AND guarantees the ring
  // search touches O(n) cells overall even for degenerate (flat/collinear)
  // clouds whose bounding box is extremely anisotropic.
  double max_cells = std::min(8e6, 4.0 * (double)n + 16.0);
  for (int it = 0; it < 256; ++it) {
    double cells = 1.0;
    for (int a = 0; a < 3; ++a)
      cells *= std::max(1.0, std::ceil(ext[a] / cell));
    if (cells <= max_cells) break;
    cell *= 1.3;
  }
  g.cell = (float)cell;
  int64_t ncells = 1;
  for (int a = 0; a < 3; ++a) {
    g.dims[a] = std::max(1, (int)std::ceil(ext[a] / cell));
    ncells *= g.dims[a];
  }
  // counting sort by cell id
  std::vector<int64_t> ids(n);
  std::vector<int64_t> counts(ncells + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    ids[i] = g.cell_id(g.coord(&pts[i * 3], 0), g.coord(&pts[i * 3], 1),
                       g.coord(&pts[i * 3], 2));
    counts[ids[i] + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  g.order.resize(n);
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < n; ++i) g.order[cursor[ids[i]]++] = i;
  g.starts = std::move(counts);
  return g;
}

/* k best squared distances from query point qi (excluding qi itself). */
void knn_query(const Grid &g, const float *pts, int64_t qi, int k,
               float *best /* [k], sq dists, ascending */) {
  for (int j = 0; j < k; ++j) best[j] = std::numeric_limits<float>::max();
  const float *q = &pts[qi * 3];
  int qc[3] = {g.coord(q, 0), g.coord(q, 1), g.coord(q, 2)};
  int max_ring = 0;
  for (int a = 0; a < 3; ++a)
    max_ring = std::max(max_ring,
                        std::max(qc[a], g.dims[a] - 1 - qc[a]));
  for (int ring = 0; ring <= max_ring; ++ring) {
    // candidates in cells at Chebyshev distance == ring; every loop range
    // is clamped to the grid so out-of-bounds cells cost nothing
    int zlo = std::max(-ring, -qc[2]);
    int zhi = std::min(ring, g.dims[2] - 1 - qc[2]);
    for (int dz = zlo; dz <= zhi; ++dz) {
      int cz = qc[2] + dz;
      bool zface = std::abs(dz) == ring;
      int ylo = std::max(-ring, -qc[1]);
      int yhi = std::min(ring, g.dims[1] - 1 - qc[1]);
      for (int dy = ylo; dy <= yhi; ++dy) {
        int cy = qc[1] + dy;
        bool yface = std::abs(dy) == ring;
        int xlo = std::max(-ring, -qc[0]);
        int xhi = std::min(ring, g.dims[0] - 1 - qc[0]);
        // interior of the cube was visited in earlier rings: when this
        // (dy,dz) pair is not on a face, only dx = ±ring are new cells
        int xstep = (zface || yface || ring == 0) ? 1 : 2 * ring;
        for (int dx = xlo; dx <= xhi; ++dx) {
          if (xstep != 1 && std::abs(dx) != ring) continue;
          int cx = qc[0] + dx;
          int64_t cid = g.cell_id(cx, cy, cz);
          for (int64_t s = g.starts[cid]; s < g.starts[cid + 1]; ++s) {
            int64_t p = g.order[s];
            if (p == qi) continue;
            const float *r = &pts[p * 3];
            float d2 = (q[0] - r[0]) * (q[0] - r[0]) +
                       (q[1] - r[1]) * (q[1] - r[1]) +
                       (q[2] - r[2]) * (q[2] - r[2]);
            if (d2 < best[k - 1]) {
              int j = k - 1;
              while (j > 0 && best[j - 1] > d2) {
                best[j] = best[j - 1];
                --j;
              }
              best[j] = d2;
            }
          }
        }
      }
    }
    // done when the k-th best lies strictly inside the searched shell:
    // every unvisited cell is at least `ring * cell` away.
    if (best[k - 1] < std::numeric_limits<float>::max()) {
      float safe = (float)ring * g.cell;
      if (best[k - 1] <= safe * safe) break;
    }
  }
}

int run_knn(const float *pts, int64_t n, int k, float *out, int nthreads,
            bool mean_sq) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    return 0;
  }
  k = std::min<int64_t>(k, n - 1);
  Grid g = build_grid(pts, n);
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel
#endif
  {
    std::vector<float> best(k);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 256)
#endif
    for (int64_t i = 0; i < n; ++i) {
      knn_query(g, pts, i, k, best.data());
      if (mean_sq) {
        double acc = 0;
        for (int j = 0; j < k; ++j) acc += best[j];
        out[i] = (float)(acc / k);
      } else {
        out[i] = std::sqrt(best[0]);
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" int sn_nn_distance(const float *pts, int64_t n, float *out,
                              int nthreads) {
  return run_knn(pts, n, 1, out, nthreads, /*mean_sq=*/false);
}

extern "C" int sn_knn_mean_sq_dist(const float *pts, int64_t n, int k,
                                   float *out, int nthreads) {
  return run_knn(pts, n, k, out, nthreads, /*mean_sq=*/true);
}
