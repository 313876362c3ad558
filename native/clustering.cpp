// Native incremental-clustering runtime.
//
// The radius-gated incremental scan is the one truly sequential, host-side
// stage of the index build (order-dependent create/assign decisions — the
// reference runs it as a rayon/Mutex loop in Rust,
// src_legacy/clustering.rs:574-932 and surfface-core/src/clustering.rs:
// 240-309). Everything else in this framework lives on the TPU; this file
// is the native equivalent of the reference's Rust host runtime for that
// stage: a C++ scan with contiguous accumulators, exported with a plain C
// ABI for ctypes.
//
// Two semantic modes:
//   mode=0 "legacy"  — create if (ncent < cap && d2 > radius*0.5);
//                       else assign if d2 <= radius (online mean update);
//                       else soft-assign if d2 <= 1.5*radius (count only);
//                       else drop (assignment = -1).
//   mode=1 "stage_a" — assign if d2 < radius (online mean + Welford M2);
//                       else create if capacity; else force-assign.
//
// Welford M2 accumulators are always maintained so Stage A gets real
// diagonal variances (replacing the reference's external kalman_clustering
// crate).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Returns the number of centroids created.
// X: [n, f] float32 row-major.
// keep: [n] uint8 sampling mask (1 = process row, 0 = skip); may be null.
// Outputs (caller-allocated):
//   centroids: [cap, f] float64
//   m2:        [cap, f] float64 (Welford sum of squared deviations)
//   counts:    [cap] int64
//   assignments: [n] int64 (-1 = dropped)
std::int64_t mrs_incremental_cluster(
    const float* X, std::int64_t n, std::int64_t f,
    std::int64_t cap, double radius, int mode,
    const std::uint8_t* keep,
    double* centroids, double* m2, std::int64_t* counts,
    std::int64_t* assignments) {
  const double kRelax = 1.5;
  const double kCreateFactor = 0.5;

  std::memset(centroids, 0, sizeof(double) * cap * f);
  std::memset(m2, 0, sizeof(double) * cap * f);
  std::memset(counts, 0, sizeof(std::int64_t) * cap);
  for (std::int64_t i = 0; i < n; ++i) assignments[i] = -1;

  std::int64_t ncent = 0;
  std::vector<double> cnorm2(cap, 0.0);

  auto recompute_cnorm = [&](std::int64_t ci) {
    const double* c = centroids + ci * f;
    double s = 0.0;
    for (std::int64_t j = 0; j < f; ++j) s += c[j] * c[j];
    cnorm2[ci] = s;
  };

  auto add_point = [&](std::int64_t ci, const float* row) {
    counts[ci] += 1;
    const double inv = 1.0 / static_cast<double>(counts[ci]);
    double* c = centroids + ci * f;
    double* v = m2 + ci * f;
    for (std::int64_t j = 0; j < f; ++j) {
      const double x = static_cast<double>(row[j]);
      const double delta = x - c[j];
      c[j] += delta * inv;
      v[j] += delta * (x - c[j]);
    }
    recompute_cnorm(ci);
  };

  auto create = [&](const float* row) -> std::int64_t {
    double* c = centroids + ncent * f;
    for (std::int64_t j = 0; j < f; ++j) c[j] = static_cast<double>(row[j]);
    counts[ncent] = 1;
    recompute_cnorm(ncent);
    return ncent++;
  };

  // Row staging buffer in f64 so the hot distance loop is pure-f64 FMA
  // (per-element f32→f64 converts defeat auto-vectorization). Distances use
  // the ‖x-c‖² = ‖x‖² + ‖c‖² - 2⟨x,c⟩ form: the scan becomes dot products
  // (2 FLOPs/elem instead of 3) with four independent accumulators to break
  // the FMA dependency chain. Centroid norms update incrementally.
  std::vector<double> rowbuf(f);

  for (std::int64_t i = 0; i < n; ++i) {
    if (keep != nullptr && keep[i] == 0) continue;
    const float* row = X + i * f;
    double* __restrict rb = rowbuf.data();
    double xsq = 0.0;
#pragma omp simd reduction(+ : xsq)
    for (std::int64_t j = 0; j < f; ++j) {
      rb[j] = static_cast<double>(row[j]);
      xsq += rb[j] * rb[j];
    }

    // Nearest centroid (linear scan — C is small; contiguous and branch-free).
    // `omp simd reduction` licenses reassociation for THIS loop only, so the
    // f64 dot vectorizes (plain loops can't: FP reduction reordering; and a
    // manual 4-accumulator unroll blocks the vectorizer outright).
    std::int64_t best = 0;
    double best_d2 = std::numeric_limits<double>::infinity();
    for (std::int64_t c = 0; c < ncent; ++c) {
      const double* __restrict cc = centroids + c * f;
      double dot = 0.0;
#pragma omp simd reduction(+ : dot)
      for (std::int64_t j = 0; j < f; ++j) dot += rb[j] * cc[j];
      double d2 = xsq + cnorm2[c] - 2.0 * dot;
      if (d2 < 0.0) d2 = 0.0;
      if (d2 < best_d2) {
        best_d2 = d2;
        best = c;
      }
    }

    if (ncent == 0) {
      assignments[i] = create(row);
      continue;
    }

    if (mode == 0) {  // legacy
      if (ncent < cap && best_d2 > radius * kCreateFactor) {
        assignments[i] = create(row);
      } else if (best_d2 <= radius) {
        add_point(best, row);
        assignments[i] = best;
      } else if (best_d2 <= radius * kRelax) {
        counts[best] += 1;  // soft outlier: count only, centroid unmoved
        assignments[i] = best;
      }
      // else: dropped, assignment stays -1
    } else {  // stage_a
      if (best_d2 < radius) {
        add_point(best, row);
        assignments[i] = best;
      } else if (ncent < cap) {
        assignments[i] = create(row);
      } else {
        add_point(best, row);  // budget exhausted: force-assign
        assignments[i] = best;
      }
    }
  }

  return ncent;
}

// Batch nearest-centroid assignment (no creation): used for query routing
// and parity checks. Returns d2 and index per row.
void mrs_nearest_centroid(
    const float* X, std::int64_t n, std::int64_t f,
    const double* centroids, std::int64_t ncent,
    std::int64_t* out_idx, double* out_d2) {
  for (std::int64_t i = 0; i < n; ++i) {
    const float* row = X + i * f;
    std::int64_t best = 0;
    double best_d2 = std::numeric_limits<double>::infinity();
    for (std::int64_t c = 0; c < ncent; ++c) {
      const double* cc = centroids + c * f;
      double d2 = 0.0;
#pragma omp simd reduction(+ : d2)
      for (std::int64_t j = 0; j < f; ++j) {
        const double diff = static_cast<double>(row[j]) - cc[j];
        d2 += diff * diff;
      }
      if (d2 < best_d2) {
        best_d2 = d2;
        best = c;
      }
    }
    out_idx[i] = best;
    out_d2[i] = best_d2;
  }
}

}  // extern "C"
