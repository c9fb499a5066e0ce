// graphkit — native host-side graph preprocessing kernels.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// CPU-side preprocessing that sits in front of it (the reference does all of
// this in Python/NumPy — e.g. its O(N²·P) adjacency loop at
// pygcn/utils.py:124-129 and pure-Python CSV parsing):
//
//   gk_sort_edges_by_row   — receiver-major stable edge sort (COO canonical
//                            form for the Graph container)
//   gk_coo_to_csr          — CSR row-pointer derivation
//   gk_build_ell_layout    — bucketed-ELL virtual-row layout (the fast SpMM
//                            path's host build)
//   gk_parse_edge_list     — fast two/three-column text edge-list parser
//                            (Planetoid .cites files)
//
// Exposed with C linkage and called from Python via ctypes on NumPy buffers
// (zero-copy). Built by native/build.sh (invoked from setup.py or on first
// import); pygcn_tpu falls back to the NumPy implementations when the shared
// library is absent.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

extern "C" {

// Stable sort of (senders, receivers, weights) by (receiver, sender).
// idx_out[e] receives the permutation; caller applies it with NumPy take.
void gk_sort_edges_by_row(const int64_t* senders, const int64_t* receivers,
                          int64_t n_edges, int64_t* idx_out) {
  std::iota(idx_out, idx_out + n_edges, int64_t{0});
  std::stable_sort(idx_out, idx_out + n_edges, [&](int64_t a, int64_t b) {
    if (receivers[a] != receivers[b]) return receivers[a] < receivers[b];
    return senders[a] < senders[b];
  });
}

// CSR indptr from row-sorted receiver ids.
void gk_coo_to_csr(const int64_t* receivers_sorted, int64_t n_edges,
                   int64_t n_rows, int64_t* indptr_out) {
  std::memset(indptr_out, 0, sizeof(int64_t) * (n_rows + 1));
  for (int64_t e = 0; e < n_edges; ++e) indptr_out[receivers_sorted[e] + 1]++;
  for (int64_t r = 0; r < n_rows; ++r) indptr_out[r + 1] += indptr_out[r];
}

// Bucketed-ELL planning: split rows into virtual rows of <= ks[n_ks-1]
// entries and assign each chunk to the smallest bucket K >= chunk length.
// Pass 1 (counts_out != null, others null): per-bucket virtual-row counts.
// Pass 2: fills, per bucket b (with base offsets provided by the caller via
// bucket_base), cols[b][vr*K+j], vals, rows flattened into per-bucket arrays.
void gk_build_ell_count(const int64_t* indptr, int64_t n_rows,
                        const int64_t* ks, int64_t n_ks, int64_t* counts_out) {
  const int64_t kmax = ks[n_ks - 1];
  std::memset(counts_out, 0, sizeof(int64_t) * n_ks);
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t d = indptr[r + 1] - indptr[r];
    if (d == 0) {
      counts_out[0]++;
      continue;
    }
    while (d > 0) {
      int64_t chunk = d < kmax ? d : kmax;
      int64_t b = int64_t(std::lower_bound(ks, ks + n_ks, chunk) - ks);
      counts_out[b]++;
      d -= chunk;
    }
  }
}

void gk_build_ell_fill(const int64_t* indptr, const int64_t* indices,
                       const float* data, int64_t n_rows, const int64_t* ks,
                       int64_t n_ks,
                       int32_t** cols_out,  // per-bucket [count_b * K_b]
                       float** vals_out,    // per-bucket [count_b * K_b]
                       int32_t** rows_out)  // per-bucket [count_b]
{
  const int64_t kmax = ks[n_ks - 1];
  std::vector<int64_t> cursor(n_ks, 0);
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t d = indptr[r + 1] - indptr[r];
    int64_t start = indptr[r];
    if (d == 0) {
      int64_t b = 0, k = ks[0], c = cursor[b]++;
      std::memset(cols_out[b] + c * k, 0, sizeof(int32_t) * k);
      std::memset(vals_out[b] + c * k, 0, sizeof(float) * k);
      rows_out[b][c] = int32_t(r);
      continue;
    }
    while (d > 0) {
      int64_t chunk = d < kmax ? d : kmax;
      int64_t b = int64_t(std::lower_bound(ks, ks + n_ks, chunk) - ks);
      int64_t k = ks[b];
      int64_t c = cursor[b]++;
      for (int64_t j = 0; j < chunk; ++j) {
        cols_out[b][c * k + j] = int32_t(indices[start + j]);
        vals_out[b][c * k + j] = data[start + j];
      }
      for (int64_t j = chunk; j < k; ++j) {
        cols_out[b][c * k + j] = 0;
        vals_out[b][c * k + j] = 0.0f;
      }
      rows_out[b][c] = int32_t(r);
      start += chunk;
      d -= chunk;
    }
  }
}

// splitmix64 — deterministic label hash for tie-breaking (see below).
static inline uint64_t gk_mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

// Weighted asynchronous label propagation over a CSR graph. Near-linear
// community detection (Raghavan et al. 2007): each node repeatedly adopts
// the label with the largest incident weight among its neighbors. This is
// the scale path for locality ordering (parallel/partition.py) — Python
// Louvain is infeasible beyond ~1M edges, and community order is what lets
// the hybrid BCSR+ELL layout route dense tiles to the MXU on big real-world
// graphs. Deterministic: nodes sweep in natural order; the current label is
// kept on ties; among other tied labels the largest splitmix64 hash wins —
// a fixed-but-arbitrary order, because any GLOBAL order (e.g. smallest
// label) makes one extreme label flood the whole graph during the first
// sweep, when every vote is a 1-vote tie. Returns the sweep count.
int64_t gk_label_propagation(const int64_t* indptr, const int64_t* indices,
                             const float* weights,  // may be null (unweighted)
                             int64_t n_rows, int64_t max_iters,
                             int64_t* labels_out) {
  std::iota(labels_out, labels_out + n_rows, int64_t{0});
  std::vector<float> votes(size_t(n_rows), 0.0f);
  std::vector<int64_t> touched;
  touched.reserve(64);
  int64_t it = 0;
  for (; it < max_iters; ++it) {
    int64_t changed = 0;
    for (int64_t u = 0; u < n_rows; ++u) {
      const int64_t lo = indptr[u], hi = indptr[u + 1];
      if (lo == hi) continue;
      touched.clear();
      for (int64_t e = lo; e < hi; ++e) {
        int64_t lab = labels_out[indices[e]];
        if (votes[lab] == 0.0f) touched.push_back(lab);
        votes[lab] += weights ? weights[e] : 1.0f;
      }
      const int64_t cur = labels_out[u];
      int64_t best = cur;
      float best_v = votes[cur];  // 0 if no neighbor carries cur
      uint64_t best_h = 0;
      for (int64_t lab : touched) {
        float v = votes[lab];
        if (v < best_v || lab == best) continue;
        uint64_t h = gk_mix64(uint64_t(lab));
        if (v > best_v || (best != cur && h > best_h)) {
          best = lab;
          best_v = v;
          best_h = h;
        }
      }
      for (int64_t lab : touched) votes[lab] = 0.0f;
      if (best != cur) {
        labels_out[u] = best;
        ++changed;
      }
    }
    if (changed == 0) break;
  }
  return it;
}

// Sorted unique + inverse map over int64 keys — np.unique(return_inverse)
// semantics, but hash-based instead of sort-based over the full array (only
// the unique keys are sorted). This is the hot host-side step of layered
// neighborhood sampling (ops/sampling.py builds the per-layer node set by
// deduplicating seeds + sampled neighbor ids every minibatch; the reference
// has no sampler — it trains full-batch only, pygcn/train.py).
// uniq_out needs capacity n; returns the unique count.
int64_t gk_unique_inverse(const int64_t* vals, int64_t n, int64_t* uniq_out,
                          int64_t* inverse_out) {
  if (n == 0) return 0;
  // open-addressing table: slot -> (key, rank); size = pow2 >= 2n
  uint64_t cap = 1;
  while (cap < uint64_t(n) * 2) cap <<= 1;
  const uint64_t mask = cap - 1;
  std::vector<int64_t> keys(cap);
  std::vector<int64_t> rank(cap);
  std::vector<uint8_t> used(cap, 0);

  int64_t n_uniq = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t v = vals[i];
    uint64_t h = gk_mix64(uint64_t(v)) & mask;
    while (used[h] && keys[h] != v) h = (h + 1) & mask;
    if (!used[h]) {
      used[h] = 1;
      keys[h] = v;
      uniq_out[n_uniq++] = v;
    }
  }
  std::sort(uniq_out, uniq_out + n_uniq);
  for (int64_t r = 0; r < n_uniq; ++r) {
    const int64_t v = uniq_out[r];
    uint64_t h = gk_mix64(uint64_t(v)) & mask;
    while (keys[h] != v) h = (h + 1) & mask;  // slot exists by construction
    rank[h] = r;
  }
  for (int64_t i = 0; i < n; ++i) {
    const int64_t v = vals[i];
    uint64_t h = gk_mix64(uint64_t(v)) & mask;
    while (keys[h] != v) h = (h + 1) & mask;
    inverse_out[i] = rank[h];
  }
  return n_uniq;
}

// Bounded-range variant: vals are known to lie in [0, n_max) (node ids), so
// a dense presence/rank table replaces the hash — two sequential passes over
// vals plus two over n_max, far faster than either a hash or a sort when
// n_max is graph-sized. scratch must hold n_max int32 and be zero-initialized
// by the caller (it is returned zeroed again, so one buffer can be reused
// across calls).
int64_t gk_unique_inverse_bounded(const int64_t* vals, int64_t n,
                                  int64_t n_max, int32_t* scratch,
                                  int64_t* uniq_out, int64_t* inverse_out) {
  for (int64_t i = 0; i < n; ++i) scratch[vals[i]] = 1;
  int64_t n_uniq = 0;
  for (int64_t v = 0; v < n_max; ++v) {
    if (scratch[v]) {
      uniq_out[n_uniq] = v;
      scratch[v] = int32_t(++n_uniq);  // rank + 1 (0 = absent)
    }
  }
  for (int64_t i = 0; i < n; ++i) inverse_out[i] = scratch[vals[i]] - 1;
  for (int64_t r = 0; r < n_uniq; ++r) scratch[uniq_out[r]] = 0;
  return n_uniq;
}

// Fixed-fanout neighbor sampling over CSR: one fused pass doing the RNG
// picks, the CSR column/value gathers, and the aggregation-weight math that
// ops/sampling.py::NeighborSampler._sample_layer otherwise runs as four
// separate NumPy passes (the hot host-side cost of minibatch sampled
// training once dedup went native; the reference trains full-batch only).
// RNG is counter-based splitmix64: pick (i,j) = mix64(base + i*k + j) % deg,
// so results are deterministic in `base` alone, order-independent, and
// bit-identical to the NumPy fallback. mode 0 = 'gcn' (w * deg/k, an
// unbiased estimator of the A_hat row sum), mode 1 = 'mean' (1/k).
// Zero-degree rows emit the node itself with weight 0.
void gk_sample_layer(const int64_t* indptr, const int64_t* indices,
                     const float* data, const int64_t* out_nodes, int64_t m,
                     int64_t k, uint64_t base, int32_t mode,
                     int64_t* cols_out /* [m*k] */,
                     float* weights_out /* [m*k] */) {
  for (int64_t i = 0; i < m; ++i) {
    const int64_t node = out_nodes[i];
    const int64_t lo = indptr[node];
    const int64_t deg = indptr[node + 1] - lo;
    int64_t* cols = cols_out + i * k;
    float* wts = weights_out + i * k;
    if (deg == 0) {
      for (int64_t j = 0; j < k; ++j) {
        cols[j] = node;
        wts[j] = 0.0f;
      }
      continue;
    }
    const float scale =
        mode == 0 ? float(deg) / float(k) : 1.0f / float(k);
    const uint64_t row_base = base + uint64_t(i) * uint64_t(k);
    for (int64_t j = 0; j < k; ++j) {
      const uint64_t h = gk_mix64(row_base + uint64_t(j));
      const int64_t pos = lo + int64_t(h % uint64_t(deg));
      cols[j] = indices[pos];
      wts[j] = mode == 0 ? data[pos] * scale : scale;
    }
  }
}

// Row-parallel variant of gk_sample_layer: rows split into contiguous chunks,
// one std::thread each. Bit-identical to the serial kernel for any thread
// count — the RNG is a pure counter hash and each row owns disjoint output
// slots — so callers may pick threads purely by host load. n_threads <= 1
// degrades to the serial loop (no thread spawn).
void gk_sample_layer_mt(const int64_t* indptr, const int64_t* indices,
                        const float* data, const int64_t* out_nodes,
                        int64_t m, int64_t k, uint64_t base, int32_t mode,
                        int64_t n_threads, int64_t* cols_out,
                        float* weights_out) {
  if (n_threads <= 1 || m < 2) {
    gk_sample_layer(indptr, indices, data, out_nodes, m, k, base, mode,
                    cols_out, weights_out);
    return;
  }
  if (n_threads > m) n_threads = m;
  const int64_t chunk = (m + n_threads - 1) / n_threads;
  std::vector<std::thread> threads;
  threads.reserve(size_t(n_threads));
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(lo + chunk, m);
    if (lo >= hi) break;
    threads.emplace_back([=] {
      // same math as the serial kernel with the row counter offset by lo,
      // writing into the caller's buffers at the chunk's own offset
      gk_sample_layer(indptr, indices, data, out_nodes + lo, hi - lo, k,
                      base + uint64_t(lo) * uint64_t(k), mode,
                      cols_out + lo * k, weights_out + lo * k);
    });
  }
  for (auto& th : threads) th.join();
}

// Parse a whitespace-separated two-column integer edge list (e.g. Planetoid
// .cites). Returns the number of edges parsed, or -1 on open failure.
// Caller provides capacity; pass cap=0 to just count.
int64_t gk_parse_edge_list(const char* path, int64_t* col0, int64_t* col1,
                           int64_t cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size_t(size) + 1);
  size_t got = std::fread(buf.data(), 1, size_t(size), f);
  std::fclose(f);
  buf[got] = '\0';

  int64_t n = 0;
  const char* p = buf.data();
  const char* end = p + got;
  while (p < end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    char* next = nullptr;
    long long a = std::strtoll(p, &next, 10);
    if (next == p) break;
    p = next;
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    long long b = std::strtoll(p, &next, 10);
    if (next == p) break;
    p = next;
    if (cap > 0) {
      if (n >= cap) break;
      col0[n] = a;
      col1[n] = b;
    }
    ++n;
  }
  return n;
}

}  // extern "C"
