// Host-side graph kernels for dibs-tpu: DAG check, Kahn toposort,
// Barabási–Albert preferential-attachment sampling.
//
// Replaces the igraph C core the reference library depends on
// (behavioral spec: /root/reference/dibs/graph_utils.py:33-69 and
// /root/reference/dibs/models/graph.py:132-151). Exposed with a C ABI and
// loaded from Python via ctypes (dibs_tpu/native/graph.py); all functions are
// pure host-side helpers off the XLA hot path.
//
// Build: `make -C dibs_tpu/native` -> libdibsgraph.so
//
// Adjacency convention: row-major [n, n] int32, mat[i*n + j] != 0 means edge
// i -> j.

#include <cstdint>
#include <vector>

namespace {

// splitmix64 — small deterministic PRNG for the BA sampler.
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // uniform double in [0, 1)
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

}  // namespace

extern "C" {

// Kahn's algorithm. Writes a topological order into out[n]; returns 1 on
// success, 0 if the graph contains a directed cycle.
int dibs_toposort(const int32_t* mat, int32_t n, int32_t* out) {
  std::vector<int32_t> indeg(n, 0);
  for (int32_t i = 0; i < n; ++i)
    for (int32_t j = 0; j < n; ++j)
      if (mat[i * n + j] != 0) ++indeg[j];

  std::vector<int32_t> stack;
  stack.reserve(n);
  for (int32_t v = 0; v < n; ++v)
    if (indeg[v] == 0) stack.push_back(v);

  int32_t count = 0;
  while (!stack.empty()) {
    int32_t u = stack.back();
    stack.pop_back();
    out[count++] = u;
    for (int32_t c = 0; c < n; ++c) {
      if (mat[u * n + c] != 0 && --indeg[c] == 0) stack.push_back(c);
    }
  }
  return count == n ? 1 : 0;
}

// Returns 1 iff the adjacency matrix is a DAG.
int dibs_is_dag(const int32_t* mat, int32_t n) {
  std::vector<int32_t> scratch(n);
  return dibs_toposort(mat, n, scratch.data());
}

// Directed Barabási–Albert sample: vertex v picks min(m, v) distinct targets
// among 0..v-1 with probability proportional to in_degree + 1 and adds edges
// v -> target (same generative process as igraph's directed Barabasi with
// zero_appeal = 1 and no duplicate edges). Result is a DAG by construction
// (edges run from later to earlier vertices). Writes [n, n] into out;
// returns 1.
int dibs_barabasi_albert(int32_t n, int32_t m, uint64_t seed, int32_t* out) {
  for (int64_t i = 0; i < (int64_t)n * n; ++i) out[i] = 0;
  if (n <= 0) return 1;

  SplitMix64 rng(seed);
  std::vector<double> weight(n, 0.0);  // in_degree + 1 (as double for sampling)
  for (int32_t v = 0; v < n; ++v) weight[v] = 1.0;

  std::vector<int32_t> chosen;
  chosen.reserve(m);
  for (int32_t v = 1; v < n; ++v) {
    const int32_t k = v < m ? v : m;
    chosen.clear();
    // weighted sampling without replacement: repeatedly draw from the
    // cumulative weights of un-chosen candidates (k and v are tiny).
    std::vector<double> w(weight.begin(), weight.begin() + v);
    for (int32_t pick = 0; pick < k; ++pick) {
      double total = 0.0;
      for (int32_t c = 0; c < v; ++c) total += w[c];
      double r = rng.uniform() * total;
      int32_t target = v - 1;
      double acc = 0.0;
      for (int32_t c = 0; c < v; ++c) {
        acc += w[c];
        if (r < acc) {
          target = c;
          break;
        }
      }
      chosen.push_back(target);
      w[target] = 0.0;  // without replacement
    }
    for (int32_t t : chosen) {
      out[(int64_t)v * n + t] = 1;
      weight[t] += 1.0;
    }
  }
  return 1;
}

}  // extern "C"
