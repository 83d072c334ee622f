// Native host-side helpers for sdvo_tpu.
//
// The TPU owns every per-frame hot loop; the remaining data-dependent,
// branch-heavy host work — ANMS feature selection via Suppression-by-Square-
// Covering (binary search on suppression radius), occupancy-grid bucketing,
// and threshold extraction — runs here as a small C++ library loaded through
// ctypes (this plays the role the reference's C++ feature_selection.cpp:165-248
// plays on its CPU pipeline; kept native because it runs per keyframe with
// data-dependent loops that would serialize terribly on an accelerator).
//
// Build: `make -C native` → libsdvo_host.so; sdvo_tpu.features.ssc falls back
// to a pure-Python implementation when the library is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// Suppression via Square Covering (SSC) adaptive non-maximal suppression.
// Inputs must be sorted by response, strongest first (the caller sorts).
// Returns the number of selected indices written to out_indices.
//
// Implements the published SSC algorithm of Bailo et al., "Efficient
// adaptive non-maximal suppression algorithms for homogeneous spatial
// keypoint distribution" (Pattern Recognition Letters 2018), following the
// authors' released reference code (github.com/BAILOOL/ANMS-Codes) — the
// same algorithm the reference vendors (feature_selection.cpp:165-248):
// binary search on the suppression-square width until the kept-point count
// lands in [K*(1-tol), K*(1+tol)].
int32_t sdvo_ssc_select(const float* xs, const float* ys, int32_t n,
                        int32_t num_ret_points, float tolerance, int32_t cols,
                        int32_t rows, int32_t* out_indices) {
  if (n <= 0 || num_ret_points <= 0) return 0;
  if (n <= num_ret_points) {
    for (int32_t i = 0; i < n; ++i) out_indices[i] = i;
    return n;
  }

  const long long exp1 = (long long)rows + cols + 2LL * num_ret_points;
  const long long exp2 =
      4LL * cols + 4LL * num_ret_points + 4LL * rows * num_ret_points +
      (long long)rows * rows + (long long)cols * cols -
      2LL * rows * cols + 4LL * rows * cols * num_ret_points;
  const double exp3 = std::sqrt(static_cast<double>(exp2));
  const double exp4 = 2.0 * (num_ret_points - 1);

  const double sol1 = -std::round((exp1 + exp3) / exp4);
  const double sol2 = -std::round((exp1 - exp3) / exp4);
  int high = static_cast<int>(sol1 > sol2 ? sol1 : sol2);
  int low = static_cast<int>(std::sqrt(static_cast<double>(n) / num_ret_points));

  int width = 0, prev_width = -1;
  const float K = static_cast<float>(num_ret_points);
  const uint32_t kmin = static_cast<uint32_t>(std::round(K - K * tolerance));
  const uint32_t kmax = static_cast<uint32_t>(std::round(K + K * tolerance));

  std::vector<int32_t> result, prev_result;
  result.reserve(n);

  while (true) {
    width = low + (high - low) / 2;
    if (width == prev_width || low > high) {
      result = prev_result;  // reuse previous iteration's keypoints
      break;
    }
    result.clear();
    const double c = width / 2.0;
    const int32_t ncols = static_cast<int32_t>(cols / c);
    const int32_t nrows = static_cast<int32_t>(rows / c);
    std::vector<uint8_t> covered((nrows + 1) * (ncols + 1), 0);
    const int32_t reach = static_cast<int32_t>(width / c);

    for (int32_t i = 0; i < n; ++i) {
      const int32_t row = static_cast<int32_t>(ys[i] / c);
      const int32_t col = static_cast<int32_t>(xs[i] / c);
      if (row > nrows || col > ncols) continue;
      if (!covered[row * (ncols + 1) + col]) {
        result.push_back(i);
        const int32_t rmin = row >= reach ? row - reach : 0;
        const int32_t rmax = std::min(row + reach, nrows);
        const int32_t cmin = col >= reach ? col - reach : 0;
        const int32_t cmax = std::min(col + reach, ncols);
        for (int32_t r = rmin; r <= rmax; ++r)
          for (int32_t cc = cmin; cc <= cmax; ++cc)
            covered[r * (ncols + 1) + cc] = 1;
      }
    }

    if (result.size() >= kmin && result.size() <= kmax) break;
    if (result.size() < kmin)
      high = width - 1;
    else
      low = width + 1;
    prev_width = width;
    prev_result = result;
  }

  const int32_t count = static_cast<int32_t>(result.size());
  std::copy(result.begin(), result.end(), out_indices);
  return count;
}

// Extract pixels with response > threshold from a row-major uint8 gradient
// image, sorted by response descending. Returns count (capped at max_out).
// Replaces the reference's per-pixel scan + std::sort
// (feature_selection.cpp:39-54).
int32_t sdvo_threshold_extract(const uint8_t* grad, int32_t rows, int32_t cols,
                               int32_t threshold, float* out_x, float* out_y,
                               float* out_resp, int32_t max_out) {
  std::vector<int32_t> idx;
  idx.reserve(4096);
  const int64_t total = (int64_t)rows * cols;
  for (int64_t i = 0; i < total; ++i)
    if (grad[i] > threshold) idx.push_back(static_cast<int32_t>(i));
  std::sort(idx.begin(), idx.end(), [grad](int32_t a, int32_t b) {
    return grad[a] > grad[b];
  });
  const int32_t count = std::min<int32_t>(static_cast<int32_t>(idx.size()), max_out);
  for (int32_t i = 0; i < count; ++i) {
    out_x[i] = static_cast<float>(idx[i] % cols);
    out_y[i] = static_cast<float>(idx[i] / cols);
    out_resp[i] = static_cast<float>(grad[idx[i]]);
  }
  return count;
}

// Occupancy-grid bucketing: keep at most one point per cell, skipping cells
// already occupied (feature_selection.cpp:62-78, setExistingFeatures :269-282).
// Points are visited in the given order (strongest first). occupancy is a
// row-major uint8 grid of (grid_rows x grid_cols), modified in place.
int32_t sdvo_bucket_points(const float* xs, const float* ys, int32_t n,
                           int32_t cell_size, int32_t grid_cols,
                           int32_t grid_rows, uint8_t* occupancy,
                           int32_t* out_keep) {
  int32_t kept = 0;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t cx = static_cast<int32_t>(xs[i]) / cell_size;
    const int32_t cy = static_cast<int32_t>(ys[i]) / cell_size;
    if (cx < 0 || cy < 0 || cx >= grid_cols || cy >= grid_rows) continue;
    if (!occupancy[cy * grid_cols + cx]) {
      occupancy[cy * grid_cols + cx] = 1;
      out_keep[kept++] = i;
    }
  }
  return kept;
}

}  // extern "C"
