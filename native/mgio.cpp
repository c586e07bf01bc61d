// Native host runtime for multigridsolver_tpu.
//
// The reference implements its host layer in C++/CUDA (Matrix Market
// parsing in src/common/MatrixIO.cpp:12-57 and
// src/GPU_CUDAC++/MatrixIO.cu:115-168; the serial aggregation baseline in
// src/CPU_C++/AGMG.cpp).  This library provides the TPU framework's native
// equivalents, exposed through a C ABI consumed via ctypes
// (multigridsolver_tpu/io/native.py):
//
//   * mgio_read_mtx       — fast .mtx → COO parser (multi-GB files parse
//                           orders of magnitude faster than Python)
//   * mgio_write_mtx      — COO → .mtx writer
//   * mgio_coo_to_csr     — sort + duplicate-merge COO→CSR assembly
//   * mgio_cmk_order      — BFS ("simplified CMK") ordering, the
//                           aggregation priority of AGMG.cpp:14-46
//   * mgio_greedy_pass    — exact sequential greedy pairwise matching,
//                           parity twin of AGMG.cpp:101-194 (the CPU
//                           baseline path of the reference)
//
// Build: make -C native   (produces libmgio.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>
#include <numeric>

namespace {

struct CooResult {
  int64_t nrows = 0, ncols = 0, nnz = 0;
  bool ok = false;
  std::vector<int64_t> row, col;
  std::vector<double> val;
};

// skip whitespace, parse a (possibly signed/fractional/exponent) double
inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
    ++p;
  return p;
}

}  // namespace

extern "C" {

void *mgio_read_mtx(const char *path) {
  auto *res = new CooResult();
  FILE *f = std::fopen(path, "rb");
  if (!f) return res;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return res;
  }
  std::fclose(f);
  buf[size] = '\0';

  const char *p = buf.data();
  const char *end = buf.data() + size;
  bool symmetric = false;
  // header + comments: %-prefixed lines (the reference's own generator
  // emits a single-% header, poisson.cpp:10)
  while (p < end) {
    p = skip_ws(p, end);
    if (p < end && *p == '%') {
      const char *eol = static_cast<const char *>(
          memchr(p, '\n', end - p));
      if (!eol) eol = end;
      if (memmem(p, eol - p, "symmetric", 9) != nullptr) symmetric = true;
      p = eol + 1;
    } else {
      break;
    }
  }
  char *q = nullptr;
  res->nrows = std::strtoll(p, &q, 10);
  res->ncols = std::strtoll(q, &q, 10);
  int64_t nnz = std::strtoll(q, &q, 10);
  p = q;
  res->row.reserve(nnz * (symmetric ? 2 : 1));
  res->col.reserve(nnz * (symmetric ? 2 : 1));
  res->val.reserve(nnz * (symmetric ? 2 : 1));
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t i = std::strtoll(p, &q, 10);
    if (q == p) { delete_later: res->ok = false; return res; }
    // compare each strtoll/strtod against the pointer it started from — a
    // truncated line (missing j or v) must fail, not produce col=-1/val=0
    const char *before = q;
    int64_t j = std::strtoll(q, &q, 10);
    if (q == before) goto delete_later;
    before = q;
    double v = std::strtod(q, &q);
    if (q == before) goto delete_later;
    p = q;
    res->row.push_back(i - 1);
    res->col.push_back(j - 1);
    res->val.push_back(v);
    if (symmetric && i != j) {
      res->row.push_back(j - 1);
      res->col.push_back(i - 1);
      res->val.push_back(v);
    }
  }
  res->nnz = static_cast<int64_t>(res->row.size());
  res->ok = true;
  return res;
}

void mgio_result_dims(void *handle, int64_t *dims) {
  auto *res = static_cast<CooResult *>(handle);
  dims[0] = res->nrows;
  dims[1] = res->ncols;
  dims[2] = res->nnz;
  dims[3] = res->ok ? 1 : 0;
}

void mgio_result_fill(void *handle, int64_t *row, int64_t *col,
                      double *val) {
  auto *res = static_cast<CooResult *>(handle);
  std::memcpy(row, res->row.data(), res->nnz * sizeof(int64_t));
  std::memcpy(col, res->col.data(), res->nnz * sizeof(int64_t));
  std::memcpy(val, res->val.data(), res->nnz * sizeof(double));
}

void mgio_result_free(void *handle) {
  delete static_cast<CooResult *>(handle);
}

// COO → .mtx (1-based coordinate general), mirroring MatrixIO.cpp:39-57.
int mgio_write_mtx(const char *path, int64_t nrows, int64_t ncols,
                   int64_t nnz, const int64_t *row, const int64_t *col,
                   const double *val) {
  FILE *f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f, "%%%%MatrixMarket matrix coordinate real general\n");
  std::fprintf(f, "%lld %lld %lld\n", (long long)nrows, (long long)ncols,
               (long long)nnz);
  for (int64_t k = 0; k < nnz; ++k) {
    std::fprintf(f, "%lld %lld %.17g\n", (long long)(row[k] + 1),
                 (long long)(col[k] + 1), val[k]);
  }
  std::fclose(f);
  return 0;
}

// COO → CSR with row-major sort and duplicate summation.  Returns the
// deduplicated nnz; indptr has nrows+1 entries; indices/data must be
// sized >= input nnz.
int64_t mgio_coo_to_csr(int64_t nrows, int64_t nnz, const int64_t *row,
                        const int64_t *col, const double *val,
                        int64_t *indptr, int64_t *indices, double *data) {
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (row[a] != row[b]) return row[a] < row[b];
    return col[a] < col[b];
  });
  std::fill(indptr, indptr + nrows + 1, 0);
  int64_t out = -1;
  int64_t prev_r = -1, prev_c = -1;
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t e = order[k];
    if (row[e] == prev_r && col[e] == prev_c) {
      data[out] += val[e];
    } else {
      ++out;
      indices[out] = col[e];
      data[out] = val[e];
      prev_r = row[e];
      prev_c = col[e];
      indptr[row[e] + 1]++;
    }
  }
  for (int64_t i = 0; i < nrows; ++i) indptr[i + 1] += indptr[i];
  return out + 1;
}

// BFS visitation order from node 0 (with restart for reducible matrices)
// — the reference's "CMK" priority (AGMG.cpp:14-46: no degree sort, no
// reversal).
void mgio_cmk_order(int64_t n, const int64_t *indptr,
                    const int64_t *indices, int64_t *order) {
  std::vector<char> visited(n, 0);
  int64_t cnt = 0;
  for (int64_t start = 0; start < n; ++start) {
    if (visited[start]) continue;
    visited[start] = 1;
    order[cnt++] = start;
    int64_t head = cnt - 1;
    while (head < cnt) {
      int64_t u = order[head++];
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int64_t v = indices[k];
        if (!visited[v]) {
          visited[v] = 1;
          order[cnt++] = v;
        }
      }
    }
  }
}

// Exact sequential greedy pairwise matching in the given priority order —
// the reference CPU algorithm (AGMG.cpp:101-194 semantics: per node pick
// the available neighbour with minimal mu in (0, ktg], subject to the
// feasibility test aii − si + ajj − sj ≥ 0).  `excluded` marks G0 nodes;
// si is the precomputed strength vector.  Writes per-node aggregate
// labels (−1 for excluded) and returns the aggregate count.
int64_t mgio_greedy_pass(int64_t n, const int64_t *indptr,
                         const int64_t *indices, const double *data,
                         const double *diag, const double *si,
                         const uint8_t *excluded, const int64_t *order,
                         double ktg, int32_t *labels) {
  std::vector<char> in_u(n);
  for (int64_t i = 0; i < n; ++i) in_u[i] = !excluded[i];
  std::fill(labels, labels + n, -1);

  auto coeff = [&](int64_t i, int64_t j) -> double {
    int64_t lo = indptr[i], hi = indptr[i + 1];
    const int64_t *first = indices + lo;
    const int64_t *last = indices + hi;
    const int64_t *it = std::lower_bound(first, last, j);
    if (it != last && *it == j) return data[lo + (it - first)];
    return 0.0;
  };

  int64_t nc = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (!in_u[i]) continue;
    int64_t best_j = -1;
    double best_mu = 0.0;
    double aii = diag[i];
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int64_t j = indices[k];
      if (j == i || !in_u[j]) continue;
      double aij = data[k];
      if (aij == 0.0) continue;
      double ajj = diag[j];
      if (aii - si[i] + ajj - si[j] < 0.0) continue;
      double aji = coeff(j, i);
      double num = 2.0 / (1.0 / aii + 1.0 / ajj);
      double den = -(aij + aji) / 2.0 +
                   1.0 / (1.0 / (aii - si[i]) + 1.0 / (ajj - si[j]));
      double mu = num / den;
      if (mu > 0.0 && (best_j == -1 || mu < best_mu)) {
        best_j = j;
        best_mu = mu;
      }
    }
    if (best_j != -1 && best_mu <= ktg) {
      labels[i] = nc;
      labels[best_j] = nc;
      in_u[i] = 0;
      in_u[best_j] = 0;
    } else {
      labels[i] = nc;
      in_u[i] = 0;
    }
    ++nc;
  }
  return nc;
}

// Genuine Cuthill-McKee per the Fortran ground truth
// (dagtwolev_mex.f90:529-645 dag2l_setCMK): degree-1 nodes numbered
// first in index order; start at the minimum-degree node; each BFS
// front's newly discovered neighbours are appended sorted by ascending
// degree (stable); reducible leftovers restart from the next unnumbered
// node of (progressively relaxed) minimal degree.  No reversal — AGMG
// uses plain CMK.
void mgio_cmk_order_genuine(int64_t n, const int64_t *indptr,
                            const int64_t *indices, int64_t *order) {
  std::vector<int64_t> deg(n);
  std::vector<char> numbered(n, 0);
  int64_t i2 = 0;  // count of numbered nodes
  int64_t mindg = n + 1, jj = 0;
  for (int64_t i = 0; i < n; ++i) {
    deg[i] = indptr[i + 1] - indptr[i];
    if (deg[i] > 1) {
      if (deg[i] < mindg) {
        mindg = deg[i];
        jj = i;
      }
    } else {
      order[i2++] = i;
      numbered[i] = 1;
    }
  }
  if (i2 >= n) return;
  int64_t ijs = -1;
  for (;;) {
    order[i2++] = jj;
    numbered[jj] = 1;
    int64_t i1 = i2 - 1;
    while (i1 < i2 && i2 < n) {
      int64_t u = order[i1];
      int64_t grp = i2;
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int64_t v = indices[k];
        if (v != u && !numbered[v]) {
          order[i2++] = v;
          numbered[v] = 1;
        }
      }
      std::stable_sort(order + grp, order + i2,
                       [&](int64_t a, int64_t b) {
                         return deg[a] < deg[b];
                       });
      ++i1;
    }
    if (i2 >= n) return;
    // reducible: next unnumbered node of (relaxed) minimal degree,
    // scanning cyclically exactly as the Fortran does
    jj = -1;
    while (jj < 0) {
      ++ijs;
      if (ijs >= n) {
        ++mindg;
        ijs = 0;
      }
      if (!numbered[ijs] && deg[ijs] == mindg) jj = ijs;
    }
  }
}

}  // extern "C"
