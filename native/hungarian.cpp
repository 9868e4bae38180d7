// Rectangular linear sum assignment (minimization) — native solver for the
// SELD metrics' gt<->pred track association (the reference leans on scipy's
// C++ linear_sum_assignment at src/utils/seld_metrics.py:144; this is the
// framework's own native equivalent, exposed to Python via ctypes).
//
// Algorithm: the classic Hungarian method with row/column potentials and
// shortest augmenting paths (Kuhn–Munkres / Jonker–Volgenant family,
// standard textbook formulation), O(n^2 m). Matrices in this domain are
// tiny (bounded by per-frame polyphony), so simplicity beats constants.
//
// Build: g++ -O2 -shared -fPIC -o libhungarian.so hungarian.cpp

#include <vector>
#include <limits>
#include <algorithm>
#include <cstring>

namespace {

constexpr double INF = std::numeric_limits<double>::infinity();

// Solve for n rows <= m cols; fills col4row[i] = assigned column of row i.
void solve_rows_le_cols(int n, int m, const double* C, int* col4row) {
  // 1-indexed potentials; p[j] = row currently matched to column j.
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, 0), way(m + 1, 0);

  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(m + 1, INF);
    std::vector<char> used(m + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= m; ++j) {
        if (used[j]) continue;
        double cur = C[(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (int j = 0; j <= m; ++j) {
        if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
        else         { minv[j] -= delta; }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do { int j1 = way[j0]; p[j0] = p[j1]; j0 = j1; } while (j0);
  }

  for (int j = 1; j <= m; ++j)
    if (p[j] > 0) col4row[p[j] - 1] = j - 1;
}

}  // namespace

extern "C" {

// Returns the number of assignments (= min(n_rows, n_cols)); writes
// matched (row, col) pairs sorted by row — the scipy convention.
int lsa(const double* cost, int n_rows, int n_cols, int* row_ind, int* col_ind) {
  int k = n_rows < n_cols ? n_rows : n_cols;
  if (k == 0) return 0;

  if (n_rows <= n_cols) {
    std::vector<int> col4row(n_rows, -1);
    solve_rows_le_cols(n_rows, n_cols, cost, col4row.data());
    for (int i = 0; i < n_rows; ++i) { row_ind[i] = i; col_ind[i] = col4row[i]; }
  } else {
    // transpose, solve, swap back, then sort pairs by row index.
    std::vector<double> ct((size_t)n_rows * n_cols);
    for (int i = 0; i < n_rows; ++i)
      for (int j = 0; j < n_cols; ++j)
        ct[(size_t)j * n_rows + i] = cost[(size_t)i * n_cols + j];
    std::vector<int> row4col(n_cols, -1);
    solve_rows_le_cols(n_cols, n_rows, ct.data(), row4col.data());
    std::vector<std::pair<int, int>> pairs(n_cols);
    for (int j = 0; j < n_cols; ++j) pairs[j] = {row4col[j], j};
    std::sort(pairs.begin(), pairs.end());
    for (int t = 0; t < n_cols; ++t) { row_ind[t] = pairs[t].first; col_ind[t] = pairs[t].second; }
  }
  return k;
}

}  // extern "C"
