// Native host engine: exact Vietoris–Rips persistence (H0 + H1), threaded.
//
// The reference delegates all persistence computation to the ripser C++
// library (reference scripts/utils.py:131-141).  This is this framework's own
// native engine — an independent implementation of the same mathematical
// object using the identical algorithm as the device kernel
// (ops/homology_h1.py): strict (weight, i, j) edge order, triangles addressed
// by (max-edge-rank g, opposite-vertex v), apparent-pair sieve
// (∃v: both cross ranks < rank(e) ⇒ zero-persistence pair), and persistent-
// cohomology reduction of the remaining creator columns in decreasing edge
// order with bitset columns.  Used for: host fallback of overflow windows,
// fast test oracle, and CPU-only runs.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtda_engine.so tda_engine.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct EdgeRef {
  float w;
  int i, j;
  bool operator<(const EdgeRef& o) const {
    if (w != o.w) return w < o.w;
    if (i != o.i) return i < o.i;
    return j < o.j;
  }
};

struct DSU {
  std::vector<int> p;
  explicit DSU(int n) : p(n) { for (int i = 0; i < n; ++i) p[i] = i; }
  int find(int x) {
    while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
    return x;
  }
  bool unite(int a, int b) {
    a = find(a); b = find(b);
    if (a == b) return false;
    p[a] = b;
    return true;
  }
};

class Bitset {
 public:
  explicit Bitset(int words) : w_(words, 0ull) {}
  void flip(int64_t k) { w_[k >> 6] ^= (1ull << (k & 63)); }
  void operator^=(const Bitset& o) {
    for (size_t i = 0; i < w_.size(); ++i) w_[i] ^= o.w_[i];
  }
  // first set bit ≥ hint word; returns -1 if empty
  int64_t first_set() const {
    for (size_t i = 0; i < w_.size(); ++i)
      if (w_[i]) return (int64_t)(i << 6) + __builtin_ctzll(w_[i]);
    return -1;
  }
  void clear() { std::fill(w_.begin(), w_.end(), 0ull); }
  std::vector<uint64_t> w_;
};

// One window: exact H0 deaths + H1 diagram.
void window_persistence(const float* dm, int n, float thresh, int max_bars,
                        float* h1_b, float* h1_d, int* h1_count,
                        float* h0_deaths, int* h0_count, int* h0_essential,
                        int* h1_essential) {
  const int m = n * (n - 1) / 2;
  std::vector<EdgeRef> edges;
  edges.reserve(m);
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      edges.push_back({dm[i * n + j], i, j});
  std::sort(edges.begin(), edges.end());
  int m_cx = 0;
  while (m_cx < m && edges[m_cx].w <= thresh) ++m_cx;

  // rank matrix
  std::vector<int> rank_mat(n * n, INT32_MAX);
  for (int k = 0; k < m; ++k) {
    rank_mat[edges[k].i * n + edges[k].j] = k;
    rank_mat[edges[k].j * n + edges[k].i] = k;
  }

  // MST (Kruskal over ranks) → H0 + positivity
  DSU dsu(n);
  std::vector<char> positive(m, 0);
  int nh0 = 0, n_tree = 0;
  for (int k = 0; k < m_cx; ++k) {
    if (dsu.unite(edges[k].i, edges[k].j)) {
      ++n_tree;
      if (edges[k].w > 0.0f) h0_deaths[nh0++] = edges[k].w;
    } else {
      positive[k] = 1;
    }
  }
  *h0_count = nh0;
  *h0_essential = n - n_tree;  // components at thresh (incl. isolated points)

  // apparent sieve: vstar[k] = min v with both cross ranks < k (or -1)
  std::vector<int> vstar(m_cx, -1);
  for (int k = 0; k < m_cx; ++k) {
    const int i = edges[k].i, j = edges[k].j;
    const int* ri = &rank_mat[i * n];
    const int* rj = &rank_mat[j * n];
    for (int v = 0; v < n; ++v) {
      if (ri[v] < k && rj[v] < k) { vstar[k] = v; break; }
    }
  }

  // machine over non-apparent creators, descending rank
  const int64_t KS = (int64_t)m * n;
  const int words = (int)((KS + 63) >> 6);
  Bitset col(words);
  std::vector<int32_t> claims;  // key -> NA slot (lazy alloc)
  claims.assign(KS, -1);
  std::vector<Bitset> stored;
  std::vector<int> na_edges;
  for (int k = m_cx - 1; k >= 0; --k)
    if (positive[k] && vstar[k] < 0) na_edges.push_back(k);

  auto cobd_into = [&](int g, Bitset& out) {
    const int i = edges[g].i, j = edges[g].j;
    const int* ri = &rank_mat[i * n];
    const int* rj = &rank_mat[j * n];
    for (int v = 0; v < n; ++v) {
      if (v == i || v == j) continue;
      int riv = ri[v], rjv = rj[v];
      int gmax = std::max(g, std::max(riv, rjv));
      if (gmax >= m_cx) continue;
      int opp = (gmax == riv) ? j : ((gmax == rjv) ? i : v);
      out.flip((int64_t)gmax * n + opp);
    }
  };

  int nb = 0, ness1 = 0;
  std::vector<int64_t> pair_key(na_edges.size(), -1);
  Bitset tmp(words);
  for (size_t s = 0; s < na_edges.size(); ++s) {
    const int k = na_edges[s];
    col.clear();
    cobd_into(k, col);
    for (;;) {
      int64_t p = col.first_set();
      if (p < 0) { ++ness1; pair_key[s] = -2; break; }  // essential class
      int g = (int)(p / n), v = (int)(p % n);
      if (vstar[g] == v && positive[g] && g != k) {
        tmp.clear();
        cobd_into(g, tmp);
        col ^= tmp;
      } else if (claims[p] >= 0) {
        col ^= stored[claims[p]];
      } else {
        claims[p] = (int32_t)stored.size();
        stored.push_back(col);
        pair_key[s] = p;
        break;
      }
    }
  }
  // emit visible bars
  for (size_t s = 0; s < na_edges.size() && nb < max_bars; ++s) {
    const int k = na_edges[s];
    const float birth = edges[k].w;
    if (pair_key[s] == -2) {
      h1_b[nb] = birth; h1_d[nb] = INFINITY; ++nb;
    } else if (pair_key[s] >= 0) {
      const float death = edges[(int)(pair_key[s] / n)].w;
      if (death > birth) { h1_b[nb] = birth; h1_d[nb] = death; ++nb; }
    }
  }
  *h1_count = nb;
  *h1_essential = ness1;
}

}  // namespace

extern "C" {

// Batched API: dm (n_windows, n, n) row-major f32.
// Outputs: h1_b/h1_d (n_windows, max_bars), h1_count (n_windows),
// h0_deaths (n_windows, n-1), h0_count, h0_essential, h1_essential.
void rips_persistence_batch(const float* dm, int n_windows, int n,
                            float thresh, int max_bars, int n_threads,
                            float* h1_b, float* h1_d, int* h1_count,
                            float* h0_deaths, int* h0_count,
                            int* h0_essential, int* h1_essential) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int w = next.fetch_add(1);
      if (w >= n_windows) return;
      window_persistence(dm + (int64_t)w * n * n, n, thresh, max_bars,
                         h1_b + (int64_t)w * max_bars,
                         h1_d + (int64_t)w * max_bars, h1_count + w,
                         h0_deaths + (int64_t)w * (n - 1), h0_count + w,
                         h0_essential + w, h1_essential + w);
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
}

}  // extern "C"

// ───────────────────────────────────────────────────────────────────────────
// Exact diagram Wasserstein (persim semantics) via Jonker–Volgenant LAP.
// The reference uses persim's Hungarian matching (scripts/utils.py:180-191);
// this native solver reproduces it exactly: L∞ ground metric, own-diagonal
// cost (death−birth)/2, max-of-matrix blocking, zero diagonal↔diagonal block.
// ───────────────────────────────────────────────────────────────────────────

namespace {

// Jonker–Volgenant shortest augmenting path, square cost matrix n×n.
double lap_jv(int n, const std::vector<double>& cost) {
  const double INF = 1e18;
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, INF);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
        else minv[j] -= delta;
      }
      j0 = j1;
    } while (p[j0] != 0);
    do { int j1 = way[j0]; p[j0] = p[j1]; j0 = j1; } while (j0);
  }
  double total = 0.0;
  for (int j = 1; j <= n; ++j)
    total += cost[(p[j] - 1) * n + (j - 1)];
  return total;
}

double persim_wasserstein_one(const float* b1, const float* d1, int m,
                              const float* b2, const float* d2, int nn) {
  // sentinel for empty diagrams handled by caller (pass one (0,0) point)
  const int S = m + nn;
  std::vector<double> D((size_t)S * S, 0.0);
  double mx = 0.0;
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < nn; ++j) {
      double c = std::max(std::fabs((double)b1[i] - b2[j]),
                          std::fabs((double)d1[i] - d2[j]));
      D[(size_t)i * S + j] = c;
      mx = std::max(mx, c);
    }
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < m; ++j)
      D[(size_t)i * S + nn + j] = (i == j) ? 0.5 * ((double)d1[i] - b1[i]) : mx;
  // persim prices each non-own-diagonal block at np.max(D) *at fill time* —
  // the second (dgm2) block therefore also sees dgm1's diagonal projections
  // (oracle/wasserstein_ref.py persim_cost_matrix lines 34-39)
  double mx2 = mx;
  for (int i = 0; i < m; ++i)
    mx2 = std::max(mx2, 0.5 * ((double)d1[i] - b1[i]));
  for (int i = 0; i < nn; ++i)
    for (int j = 0; j < nn; ++j)
      D[(size_t)(m + i) * S + j] = (i == j) ? 0.5 * ((double)d2[i] - b2[i]) : mx2;
  // lower-right block stays 0
  return lap_jv(S, D);
}

}  // namespace

extern "C" {

// Batched persim Wasserstein. Diagrams padded to (K1/K2); counts give valid
// prefix lengths (callers pre-drop non-finite bars; empty → caller passes
// count 0 and we use the (0,0) sentinel like reference safe_wasserstein).
void wasserstein_batch(const float* b1, const float* d1, const int* c1, int K1,
                       const float* b2, const float* d2, const int* c2, int K2,
                       int n_pairs, int n_threads, float* out) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<float> zb(1, 0.0f), zd(1, 0.0f);
    for (;;) {
      int w = next.fetch_add(1);
      if (w >= n_pairs) return;
      const float* B1 = b1 + (size_t)w * K1;
      const float* D1 = d1 + (size_t)w * K1;
      const float* B2 = b2 + (size_t)w * K2;
      const float* D2 = d2 + (size_t)w * K2;
      int m = c1[w], nn = c2[w];
      if (m == 0) { B1 = zb.data(); D1 = zd.data(); m = 1; }
      if (nn == 0) { B2 = zb.data(); D2 = zd.data(); nn = 1; }
      out[w] = (float)persim_wasserstein_one(B1, D1, m, B2, D2, nn);
    }
  };
  std::vector<std::thread> ts;
  int nt = std::max(n_threads, 1);
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

}  // extern "C"
