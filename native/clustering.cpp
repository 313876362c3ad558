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

  // cap < 1 with items present would drive the unconditional first
  // create() into an out-of-bounds write on the caller's zero-size
  // centroid buffers (confirmed under ASAN) - fail loudly instead; the
  // Python wrapper raises ValueError before ever calling in.
  if (cap < 1 && n > 0) return -1;

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

  // Blocked scan. The decisions are strictly sequential (each create/assign
  // changes the state the NEXT item sees), but the F-dimensional work is
  // not: a centroid only changes when an item lands on it, so distances of
  // a whole block of upcoming items against the block-start centroid state
  // can be precomputed as a register-blocked [B, C] dot kernel (8 items per
  // pass → 8 independent FMA chains, centroid row loaded once per 8 items
  // instead of once per item — a single-accumulator dot is latency-bound at
  // ~1/8 of AVX-512 f64 FMA throughput). When item i inside the block
  // updates or creates a centroid, only that COLUMN of the precomputed
  // distance block is stale — refresh it for the remaining items
  // (O((B−i)·F), one column per decision) and the scan stays EXACTLY
  // sequential: every (item, live-centroid-state) distance is computed
  // once, either by the block kernel or by the refresh. ‖x−c‖² uses the
  // ‖x‖²+‖c‖²−2⟨x,c⟩ form throughout (2 FLOPs/elem); centroid norms update
  // incrementally. Measured at 100k×128/cap=128: 0.79 s → 0.30 s.
  constexpr std::int64_t kBlock = 16;
  std::vector<double> rowbuf(kBlock * f, 0.0);   // f64 staging (kept rows)
  std::vector<double> xsq(kBlock, 0.0);
  std::vector<double> dist(kBlock * cap, 0.0);   // block distances [B, cap]
  std::vector<std::int64_t> idxs(kBlock);        // global row index per slot

  auto refresh_column = [&](std::int64_t c, std::int64_t from, std::int64_t nb) {
    const double* __restrict cc = centroids + c * f;
    const double cn = cnorm2[c];
    for (std::int64_t b = from; b < nb; ++b) {
      const double* __restrict rb = rowbuf.data() + b * f;
      double dot = 0.0;
#pragma omp simd reduction(+ : dot)
      for (std::int64_t j = 0; j < f; ++j) dot += rb[j] * cc[j];
      double d2 = xsq[b] + cn - 2.0 * dot;
      dist[b * cap + c] = d2 < 0.0 ? 0.0 : d2;
    }
  };

  std::int64_t i = 0;
  while (i < n) {
    // Gather the next block of kept rows.
    std::int64_t nb = 0;
    while (i < n && nb < kBlock) {
      if (keep == nullptr || keep[i] != 0) {
        const float* row = X + i * f;
        double* __restrict rb = rowbuf.data() + nb * f;
        double s = 0.0;
#pragma omp simd reduction(+ : s)
        for (std::int64_t j = 0; j < f; ++j) {
          rb[j] = static_cast<double>(row[j]);
          s += rb[j] * rb[j];
        }
        xsq[nb] = s;
        idxs[nb] = i;
        ++nb;
      }
      ++i;
    }
    if (nb == 0) break;

    // Block kernel: distances of all nb rows vs the block-start centroids.
    // Centroid-outer / 8-item-inner: the centroid row stays in L1 across
    // the group, and the 8 reductions vectorize as independent chains.
    for (std::int64_t c = 0; c < ncent; ++c) {
      const double* __restrict cc = centroids + c * f;
      const double cn = cnorm2[c];
      std::int64_t b = 0;
      for (; b + 8 <= nb; b += 8) {
        const double* __restrict r0 = rowbuf.data() + (b + 0) * f;
        const double* __restrict r1 = rowbuf.data() + (b + 1) * f;
        const double* __restrict r2 = rowbuf.data() + (b + 2) * f;
        const double* __restrict r3 = rowbuf.data() + (b + 3) * f;
        const double* __restrict r4 = rowbuf.data() + (b + 4) * f;
        const double* __restrict r5 = rowbuf.data() + (b + 5) * f;
        const double* __restrict r6 = rowbuf.data() + (b + 6) * f;
        const double* __restrict r7 = rowbuf.data() + (b + 7) * f;
        double d0 = 0.0, d1 = 0.0, d2 = 0.0, d3 = 0.0;
        double d4 = 0.0, d5 = 0.0, d6 = 0.0, d7 = 0.0;
#pragma omp simd reduction(+ : d0, d1, d2, d3, d4, d5, d6, d7)
        for (std::int64_t j = 0; j < f; ++j) {
          const double cj = cc[j];
          d0 += r0[j] * cj;
          d1 += r1[j] * cj;
          d2 += r2[j] * cj;
          d3 += r3[j] * cj;
          d4 += r4[j] * cj;
          d5 += r5[j] * cj;
          d6 += r6[j] * cj;
          d7 += r7[j] * cj;
        }
        const double acc[8] = {d0, d1, d2, d3, d4, d5, d6, d7};
        for (int u = 0; u < 8; ++u) {
          const double v = xsq[b + u] + cn - 2.0 * acc[u];
          dist[(b + u) * cap + c] = v < 0.0 ? 0.0 : v;
        }
      }
      if (b < nb) refresh_column(c, b, nb);
    }

    // Sequential decisions over the block (F-free: pure min over the
    // distance row; updates refresh their column for the remaining items).
    for (std::int64_t b = 0; b < nb; ++b) {
      const std::int64_t gi = idxs[b];
      const float* row = X + gi * f;
      const double* __restrict drow = dist.data() + b * cap;

      std::int64_t best = 0;
      double best_d2 = std::numeric_limits<double>::infinity();
      for (std::int64_t c = 0; c < ncent; ++c) {
        if (drow[c] < best_d2) {
          best_d2 = drow[c];
          best = c;
        }
      }

      if (ncent == 0) {
        assignments[gi] = create(row);
        refresh_column(ncent - 1, b + 1, nb);
        continue;
      }

      if (mode == 0) {  // legacy
        if (ncent < cap && best_d2 > radius * kCreateFactor) {
          assignments[gi] = create(row);
          refresh_column(ncent - 1, b + 1, nb);
        } else if (best_d2 <= radius) {
          add_point(best, row);
          assignments[gi] = best;
          refresh_column(best, b + 1, nb);
        } else if (best_d2 <= radius * kRelax) {
          counts[best] += 1;  // soft outlier: count only, centroid unmoved
          assignments[gi] = best;
        }
        // else: dropped, assignment stays -1
      } else {  // stage_a
        if (best_d2 < radius) {
          add_point(best, row);
          assignments[gi] = best;
          refresh_column(best, b + 1, nb);
        } else if (ncent < cap) {
          assignments[gi] = create(row);
          refresh_column(ncent - 1, b + 1, nb);
        } else {
          add_point(best, row);  // budget exhausted: force-assign
          assignments[gi] = best;
          refresh_column(best, b + 1, nb);
        }
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
