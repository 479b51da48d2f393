// Native neighbor-sampling core for NeighborLoader.
//
// The reference's NeighborLoader (GNNGraphs/src/samplers.jl:28-105) walks a
// per-node neighbor cache in Julia; here the layered fixed-fanout expansion
// is a C++ hot loop (hash-map node dedup + xorshift RNG) feeding the
// host->device batch pipeline. Built as a plain shared library and bound via
// ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  // unbiased-enough bounded draw for sampling fanouts
  uint64_t bounded(uint64_t n) { return n ? next() % n : 0; }
};

}  // namespace

extern "C" {

// Layered neighbor expansion.
//   order[e_total]   : edge indices sorted by receiver (CSR order)
//   ptr[n+1]         : CSR row pointers over receivers
//   senders[e_total] : global sender per edge (original edge order)
//   seeds[n_seeds]   : seed node ids
//   fanouts[n_layers]
// Outputs (caller-allocated to capacity):
//   nid_out[cap_nodes]          : unique node ids, seeds first
//   es_out / er_out[cap_edges]  : edges in local ids
//   eid_out[cap_edges]          : global (original) edge id per sampled edge
//                                 (the reference's EID, sampling.jl:72-75)
// Returns 0 on success; writes actual counts to n_nodes_out / n_edges_out.
int64_t gnn_sample_layers(
    const int64_t* order, const int64_t* ptr, const int32_t* senders,
    const int64_t* seeds, int64_t n_seeds, const int64_t* fanouts,
    int64_t n_layers, int32_t replace, uint64_t seed,
    int64_t cap_nodes, int64_t cap_edges,
    int64_t* nid_out, int32_t* es_out, int32_t* er_out, int64_t* eid_out,
    int64_t* n_nodes_out, int64_t* n_edges_out) {
  XorShift rng(seed);
  std::unordered_map<int64_t, int32_t> local;
  local.reserve(static_cast<size_t>(cap_nodes) * 2);
  std::vector<int64_t> nid;
  nid.reserve(cap_nodes);
  for (int64_t i = 0; i < n_seeds; ++i) {
    int64_t v = seeds[i];
    if (local.find(v) == local.end()) {
      local.emplace(v, static_cast<int32_t>(nid.size()));
      nid.push_back(v);
    }
  }
  std::vector<int64_t> frontier(seeds, seeds + n_seeds);
  std::vector<int64_t> next_frontier;
  std::vector<int64_t> picks;
  int64_t n_edges = 0;

  for (int64_t layer = 0; layer < n_layers; ++layer) {
    const int64_t k = fanouts[layer];
    next_frontier.clear();
    for (int64_t v : frontier) {
      const int64_t lo = ptr[v], hi = ptr[v + 1];
      const int64_t deg = hi - lo;
      if (deg == 0) continue;
      picks.clear();
      if (replace) {
        for (int64_t j = 0; j < k; ++j)
          picks.push_back(lo + static_cast<int64_t>(rng.bounded(deg)));
      } else if (k >= deg) {
        for (int64_t j = lo; j < hi; ++j) picks.push_back(j);
      } else {
        // Floyd's algorithm: k distinct draws from [0, deg)
        std::unordered_map<int64_t, int64_t> repl;
        for (int64_t j = deg - k; j < deg; ++j) {
          int64_t t = static_cast<int64_t>(rng.bounded(j + 1));
          auto it = repl.find(t);
          int64_t val = (it == repl.end()) ? t : it->second;
          auto jt = repl.find(j);
          repl[t] = (jt == repl.end()) ? j : jt->second;
          picks.push_back(lo + val);
        }
      }
      const int32_t v_loc = local[v];
      for (int64_t p : picks) {
        const int64_t e = order[p];
        const int64_t u = senders[e];
        auto it = local.find(u);
        int32_t u_loc;
        if (it == local.end()) {
          if (static_cast<int64_t>(nid.size()) >= cap_nodes) return -1;
          u_loc = static_cast<int32_t>(nid.size());
          local.emplace(u, u_loc);
          nid.push_back(u);
          next_frontier.push_back(u);
        } else {
          u_loc = it->second;
        }
        if (n_edges >= cap_edges) return -2;
        es_out[n_edges] = u_loc;
        er_out[n_edges] = v_loc;
        eid_out[n_edges] = e;
        ++n_edges;
      }
    }
    frontier.swap(next_frontier);
  }
  std::memcpy(nid_out, nid.data(), nid.size() * sizeof(int64_t));
  *n_nodes_out = static_cast<int64_t>(nid.size());
  *n_edges_out = n_edges;
  return 0;
}

}  // extern "C"
