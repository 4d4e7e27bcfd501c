// Read-threading de Bruijn graph construction (the hot loop of
// readthreading/AbstractReadThreadingGraph.java threading :270-320 +
// extendChainByOne :1009-1031 and ReadThreadingGraph.java non-unique kmer
// handling :67-141).
//
// Exact port of gatk_tpu/assembly/rtgraph.py build()/_thread_sequence()/
// _extend_chain()/_increase_counts_backwards(): same vertex/edge creation
// order, same non-unique-kmer rule (duplicated within any single sequence),
// same insertion-order first-match extension scan, so the Python graph
// reconstructed from this builder is identical to the pure-Python build.
//
// ctypes ABI: rtg_build() -> handle (+sizes), rtg_export() fills caller
// buffers, rtg_free(). Build: make -C native/rtgraph
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <cmath>
#include <queue>

namespace {

struct Edge {
  int32_t src, dst;
  int64_t mult;
  int32_t is_ref;
};

struct Graph {
  int k = 0;
  std::vector<uint8_t> kmers;   // n_vertices * k
  std::vector<Edge> edges;      // creation order
  std::vector<std::vector<int32_t>> out;  // vid -> edge indices (insertion order)
  std::vector<std::vector<int32_t>> in;   // vid -> edge indices
  std::unordered_map<std::string, int32_t> kmer_to_vertex;
  std::unordered_set<std::string> non_unique;
  std::vector<int32_t> ref_path;
  int error = 0;  // 1 = two ref sources, 2 = unique kmer merging into ref path

  std::string_view vkmer(int32_t vid) const {
    return {reinterpret_cast<const char*>(kmers.data()) + size_t(vid) * k,
            size_t(k)};
  }

  int32_t new_vertex(const uint8_t* kmer) {
    int32_t vid = int32_t(kmers.size() / k);
    kmers.insert(kmers.end(), kmer, kmer + k);
    out.emplace_back();
    in.emplace_back();
    std::string key(reinterpret_cast<const char*>(kmer), size_t(k));
    if (!non_unique.count(key) && !kmer_to_vertex.count(key)) {
      kmer_to_vertex.emplace(std::move(key), vid);
    }
    return vid;
  }

  void add_edge(int32_t src, int32_t dst, int64_t count, bool is_ref) {
    for (int32_t ei : out[src]) {
      if (edges[ei].dst == dst) {
        edges[ei].mult += count;
        edges[ei].is_ref |= is_ref;
        return;
      }
    }
    int32_t ei = int32_t(edges.size());
    edges.push_back({src, dst, count, is_ref});
    out[src].push_back(ei);
    in[dst].push_back(ei);
  }

  int32_t extend_chain(int32_t prev, const uint8_t* seq, int64_t kmer_start,
                       int64_t count, bool is_ref) {
    uint8_t next_base = seq[kmer_start + k - 1];
    for (int32_t ei : out[prev]) {
      int32_t tgt = edges[ei].dst;
      if (uint8_t(vkmer(tgt)[k - 1]) == next_base) {
        edges[ei].mult += count;
        return tgt;
      }
    }
    const uint8_t* kmer = seq + kmer_start;
    std::string key(reinterpret_cast<const char*>(kmer), size_t(k));
    int32_t merge = -1;
    if (!non_unique.count(key)) {
      auto it = kmer_to_vertex.find(key);
      if (it != kmer_to_vertex.end()) merge = it->second;
      if (is_ref && merge != -1) {
        error = 2;
        return merge;
      }
    }
    int32_t nxt = merge == -1 ? new_vertex(kmer) : merge;
    add_edge(prev, nxt, count, is_ref);
    return nxt;
  }

  void increase_counts_backwards(int32_t start_vid, const uint8_t* seq,
                                 int64_t seq_start, int64_t start_pos,
                                 int64_t count) {
    int32_t vid = start_vid;
    int64_t pos = start_pos;
    while (pos > seq_start) {
      std::string_view want(reinterpret_cast<const char*>(seq + pos - 1),
                            size_t(k));
      int32_t match_ei = -1;
      int n_match = 0;
      for (int32_t ei : in[vid]) {
        if (vkmer(edges[ei].src) == want) {
          match_ei = ei;
          if (++n_match > 1) break;
        }
      }
      if (n_match != 1) break;
      edges[match_ei].mult += count;
      vid = edges[match_ei].src;
      pos -= 1;
    }
  }
};

}  // namespace

extern "C" {

// seqs: concatenated bytes; per-seq arrays of length n_seqs.
// Returns an opaque handle; sizes via out params. NULL on allocation failure.
void* rtg_build(int32_t kmer_size, const uint8_t* seq_data,
                const int64_t* seq_off, const int64_t* seq_start,
                const int64_t* seq_stop, const int64_t* seq_count,
                const uint8_t* seq_is_ref, int64_t n_seqs,
                int64_t* out_n_vertices, int64_t* out_n_edges,
                int64_t* out_n_ref_path, int64_t* out_n_non_unique,
                int32_t* out_error) {
  auto* g = new (std::nothrow) Graph();
  if (!g) return nullptr;
  const int k = kmer_size;
  g->k = k;

  // pass 1: non-unique kmers (duplicated within any single sequence)
  {
    std::unordered_set<std::string_view> seen;
    for (int64_t s = 0; s < n_seqs; s++) {
      const uint8_t* seq = seq_data + seq_off[s];
      seen.clear();
      for (int64_t i = seq_start[s]; i + k <= seq_stop[s]; i++) {
        std::string_view sv(reinterpret_cast<const char*>(seq + i), size_t(k));
        if (!seen.insert(sv).second) g->non_unique.insert(std::string(sv));
      }
    }
  }

  // pass 2: thread every sequence in order
  int32_t ref_source = -1;
  for (int64_t s = 0; s < n_seqs; s++) {
    const uint8_t* seq = seq_data + seq_off[s];
    const int64_t start = seq_start[s], stop = seq_stop[s];
    const int64_t count = seq_count[s];
    const bool is_ref = seq_is_ref[s] != 0;
    // find_start: first kmer not non-unique, scanning [start, stop-k)
    // (faithful to the python range: the final kmer is not a valid start)
    int64_t start_pos = -1;
    if (is_ref) {
      start_pos = start;
    } else {
      for (int64_t i = start; i < stop - k; i++) {
        std::string_view sv(reinterpret_cast<const char*>(seq + i), size_t(k));
        if (!g->non_unique.count(std::string(sv))) {
          start_pos = i;
          break;
        }
      }
    }
    if (start_pos == -1) continue;
    std::string k0(reinterpret_cast<const char*>(seq + start_pos), size_t(k));
    int32_t vid = -1;
    auto it = g->kmer_to_vertex.find(k0);
    if (it != g->kmer_to_vertex.end() && !g->non_unique.count(k0)) {
      vid = it->second;
    } else {
      vid = g->new_vertex(seq + start_pos);
    }
    g->increase_counts_backwards(vid, seq, start, start_pos, count);
    if (is_ref) {
      if (ref_source != -1) {
        g->error = 1;
        break;
      }
      ref_source = vid;
      g->ref_path.push_back(vid);
    }
    for (int64_t i = start_pos + 1; i + k <= stop; i++) {
      vid = g->extend_chain(vid, seq, i, count, is_ref);
      if (g->error) break;
      if (is_ref) g->ref_path.push_back(vid);
    }
    if (g->error) break;
  }

  *out_n_vertices = int64_t(g->kmers.size() / size_t(k));
  *out_n_edges = int64_t(g->edges.size());
  *out_n_ref_path = int64_t(g->ref_path.size());
  *out_n_non_unique = int64_t(g->non_unique.size());
  *out_error = g->error;
  return g;
}

void rtg_export(void* handle, uint8_t* kmers_out, int32_t* edge_src,
                int32_t* edge_dst, int64_t* edge_mult, uint8_t* edge_is_ref,
                int32_t* ref_path_out, uint8_t* non_unique_out) {
  auto* g = static_cast<Graph*>(handle);
  std::memcpy(kmers_out, g->kmers.data(), g->kmers.size());
  for (size_t i = 0; i < g->edges.size(); i++) {
    edge_src[i] = g->edges[i].src;
    edge_dst[i] = g->edges[i].dst;
    edge_mult[i] = g->edges[i].mult;
    edge_is_ref[i] = uint8_t(g->edges[i].is_ref != 0);
  }
  std::memcpy(ref_path_out, g->ref_path.data(),
              g->ref_path.size() * sizeof(int32_t));
  size_t off = 0;
  for (const auto& km : g->non_unique) {
    std::memcpy(non_unique_out + off, km.data(), km.size());
    off += km.size();
  }
}

void rtg_free(void* handle) { delete static_cast<Graph*>(handle); }
}


// ===========================================================================
// Full native assembly pipeline (round-5): graph build -> cycle/quality checks
// -> LowWeightChainPruner -> dangling tail/head recovery (SW, STANDARD_NGS +
// LEADING_INDEL) -> orphan removal -> SeqGraph simplification -> k-best
// haplotype enumeration. Exact port of the Python pipeline in
// gatk_tpu/assembly/{rtgraph,seqgraph,assembler}.py (which in turn mirrors
// readthreading/ReadThreadingAssembler.java + graphs/SeqGraph.java): same
// iteration/creation orders, same tie-breaking, same double-precision score
// math, so the returned (bases, score, weakness) list is identical to the
// Python path's.
// ===========================================================================

#include "../sw/sw_core.h"

namespace {

// ---- live-graph helpers over the build Graph (edge kill flags + degrees) ----

struct LiveGraph {
  Graph* g;
  std::vector<uint8_t> edge_alive;
  std::vector<int32_t> out_deg, in_deg;

  explicit LiveGraph(Graph* gr) : g(gr) {
    edge_alive.assign(g->edges.size(), 1);
    size_t nv = g->out.size();
    out_deg.assign(nv, 0);
    in_deg.assign(nv, 0);
    for (size_t v = 0; v < nv; v++) {
      out_deg[v] = (int32_t)g->out[v].size();
      in_deg[v] = (int32_t)g->in[v].size();
    }
  }
  int32_t nv() const { return (int32_t)g->out.size(); }
  void kill(int32_t ei) {
    if (!edge_alive[ei]) return;
    edge_alive[ei] = 0;
    out_deg[g->edges[ei].src]--;
    in_deg[g->edges[ei].dst]--;
  }
  // first alive in/out edge index, or -1
  int32_t first_in(int32_t v) const {
    for (int32_t ei : g->in[v]) if (edge_alive[ei]) return ei;
    return -1;
  }
  int32_t first_out(int32_t v) const {
    for (int32_t ei : g->out[v]) if (edge_alive[ei]) return ei;
    return -1;
  }
  void add_edge(int32_t src, int32_t dst, int64_t count, bool is_ref) {
    for (int32_t ei : g->out[src]) {
      if (edge_alive[ei] && g->edges[ei].dst == dst) {
        g->edges[ei].mult += count;
        g->edges[ei].is_ref |= is_ref;
        return;
      }
    }
    int32_t ei = (int32_t)g->edges.size();
    g->edges.push_back({src, dst, count, is_ref});
    g->out[src].push_back(ei);
    g->in[dst].push_back(ei);
    edge_alive.push_back(1);
    out_deg[src]++;
    in_deg[dst]++;
  }
  bool is_ref_vertex(int32_t v) const {
    for (int32_t ei : g->in[v]) if (edge_alive[ei] && g->edges[ei].is_ref) return true;
    for (int32_t ei : g->out[v]) if (edge_alive[ei] && g->edges[ei].is_ref) return true;
    return false;
  }
};

// DFS cycle check, rtgraph.py has_cycles (white/gray/black coloring)
bool graph_has_cycles(const Graph& g) {
  int32_t nv = (int32_t)g.out.size();
  std::vector<uint8_t> color(nv, 0);
  std::vector<std::pair<int32_t, size_t>> stack;  // (vertex, next out index)
  for (int32_t root = 0; root < nv; root++) {
    if (color[root]) continue;
    stack.clear();
    stack.push_back({root, 0});
    color[root] = 1;
    while (!stack.empty()) {
      auto& [v, idx] = stack.back();
      bool advanced = false;
      while (idx < g.out[v].size()) {
        int32_t w = g.edges[g.out[v][idx]].dst;
        idx++;
        if (color[w] == 1) return true;
        if (color[w] == 0) {
          color[w] = 1;
          stack.push_back({w, 0});
          advanced = true;
          break;
        }
      }
      if (!advanced && (stack.empty() || stack.back().first == v)) {
        if (idx >= g.out[v].size()) {
          color[v] = 2;
          stack.pop_back();
        }
      }
    }
  }
  return false;
}

// LowWeightChainPruner (rtgraph.py prune_low_weight_chains + _linear_chains)
void prune_low_weight_chains(LiveGraph& lg, int32_t prune_factor) {
  Graph& g = *lg.g;
  int32_t nv = lg.nv();
  auto internal = [&](int32_t v) { return lg.in_deg[v] == 1 && lg.out_deg[v] == 1; };
  std::vector<uint8_t> visited(g.edges.size(), 0);
  std::vector<int32_t> to_remove;
  std::vector<int32_t> chain;
  for (int32_t v = 0; v < nv; v++) {
    if (internal(v)) continue;
    for (int32_t ei : g.out[v]) {
      if (!lg.edge_alive[ei] || visited[ei]) continue;
      chain.clear();
      chain.push_back(ei);
      visited[ei] = 1;
      int32_t cur = g.edges[ei].dst;
      while (internal(cur)) {
        int32_t ei2 = lg.first_out(cur);
        if (ei2 < 0 || visited[ei2]) break;
        chain.push_back(ei2);
        visited[ei2] = 1;
        cur = g.edges[ei2].dst;
      }
      bool all_low = true;
      for (int32_t ce : chain) {
        if (g.edges[ce].mult >= prune_factor || g.edges[ce].is_ref) {
          all_low = false;
          break;
        }
      }
      if (all_low)
        for (int32_t ce : chain) to_remove.push_back(ce);
    }
  }
  for (int32_t ce : to_remove) lg.kill(ce);
}

// rtgraph.py _ref_path_from
std::vector<int32_t> ref_path_from(const LiveGraph& lg, int32_t start, bool downwards) {
  const Graph& g = *lg.g;
  std::vector<int32_t> path{start};
  int32_t v = start;
  while (true) {
    const std::vector<int32_t>& edges = downwards ? g.out[v] : g.in[v];
    int32_t nxt = -1;
    for (int32_t ei : edges) {
      if (lg.edge_alive[ei] && g.edges[ei].is_ref) {
        nxt = downwards ? g.edges[ei].dst : g.edges[ei].src;
        break;
      }
    }
    if (nxt == -1) break;
    size_t np = path.size();
    if ((np >= 1 && path[np - 1] == nxt) || (np >= 2 && path[np - 2] == nxt)) break;
    path.push_back(nxt);
    v = nxt;
  }
  return path;
}

// rtgraph.py recover_dangling_tails
void recover_dangling_tails(LiveGraph& lg, int32_t prune_factor,
                            int32_t min_dangling_length) {
  Graph& g = *lg.g;
  int32_t nv_at_start = lg.nv();
  int32_t ref_sink = g.ref_path.empty() ? -1 : g.ref_path.back();
  int32_t ref_source = g.ref_path.empty() ? -1 : g.ref_path.front();
  for (int32_t v = 0; v < nv_at_start; v++) {
    if (lg.out_deg[v] > 0 || lg.in_deg[v] == 0) continue;
    if (ref_sink != -1 && v == ref_sink) continue;
    // _find_path_up_to_lca: chain upwards; LCA first after reversal
    std::vector<int32_t> path{v};
    int32_t cur = v;
    std::unordered_set<int32_t> seen{v};
    bool blocked = false;
    while (lg.in_deg[cur] == 1 && lg.out_deg[cur] < 2) {
      int32_t ei = lg.first_in(cur);
      const Edge& e = g.edges[ei];
      if (e.mult < prune_factor && !e.is_ref) { blocked = true; break; }
      if (seen.count(e.src)) { blocked = true; break; }
      seen.insert(e.src);
      path.push_back(e.src);
      cur = e.src;
    }
    if (blocked || !(lg.out_deg[cur] > 1 && cur != v)) continue;
    std::vector<int32_t> alt_path(path.rbegin(), path.rend());
    int32_t min_len = min_dangling_length + 1 > 2 ? min_dangling_length + 1 : 2;
    if ((int32_t)alt_path.size() < min_len) continue;
    if (ref_source != -1 && alt_path[0] == ref_source) continue;
    std::vector<int32_t> rpath = ref_path_from(lg, alt_path[0], true);
    if (rpath.size() < 2) continue;
    std::vector<uint8_t> ref_str(rpath.size()), alt_str(alt_path.size());
    for (size_t i = 0; i < rpath.size(); i++)
      ref_str[i] = (uint8_t)g.vkmer(rpath[i])[g.k - 1];
    for (size_t i = 0; i < alt_path.size(); i++)
      alt_str[i] = (uint8_t)g.vkmer(alt_path[i])[g.k - 1];
    Cigar aln = align_one(ref_str.data(), (int32_t)ref_str.size(), alt_str.data(),
                          (int32_t)alt_str.size(), 25, -50, -110, -6, LEADING_INDEL);
    std::vector<uint8_t> ops(aln.ops.begin(), aln.ops.end());
    std::vector<int32_t> lens(aln.lens.begin(), aln.lens.end());
    while (!ops.empty() && ops.back() == OP_D) { ops.pop_back(); lens.pop_back(); }
    if (ops.empty() || ops.back() != OP_M || ops.size() > 3) continue;
    int64_t ref_len = 0, read_len = 0;
    for (size_t i = 0; i < ops.size(); i++) {
      if (ops[i] == OP_M || ops[i] == OP_D) ref_len += lens[i];
      if (ops[i] == OP_M || ops[i] == OP_I) read_len += lens[i];
    }
    int64_t last_ref_index = ref_len - 1;
    int64_t m = 0;
    int64_t alen = (int64_t)alt_str.size();
    while (m < alen && m <= last_ref_index &&
           alt_str[alen - 1 - m] == ref_str[last_ref_index - m])
      m++;
    if (m > lens.back()) m = lens.back();
    if (m == 0) continue;
    int64_t alt_idx = read_len - m - 1;
    if (alt_idx < 0) alt_idx = 0;
    bool leading_del = ops[0] == OP_D && lens[0] + m == last_ref_index + 1;
    int64_t ref_idx = last_ref_index - m + 1 + (leading_del ? 1 : 0);
    if (ref_idx <= 0 || ref_idx >= (int64_t)rpath.size() ||
        alt_idx >= (int64_t)alt_path.size())
      continue;
    lg.add_edge(alt_path[alt_idx], rpath[ref_idx], 1, false);
  }
}

// rtgraph.py recover_dangling_heads
void recover_dangling_heads(LiveGraph& lg, int32_t prune_factor,
                            int32_t min_dangling_length) {
  Graph& g = *lg.g;
  int32_t ref_source = g.ref_path.empty() ? -1 : g.ref_path.front();
  std::vector<int32_t> heads;
  for (int32_t v = 0; v < lg.nv(); v++) {
    if (lg.in_deg[v] == 0 && lg.out_deg[v] > 0 && !(ref_source != -1 && v == ref_source))
      heads.push_back(v);
  }
  for (int32_t v : heads) {
    // _find_path_down_to_ref
    std::vector<int32_t> path{v};
    int32_t cur = v;
    std::unordered_set<int32_t> seen{v};
    bool blocked = false;
    while (!(lg.is_ref_vertex(cur) || lg.out_deg[cur] != 1)) {
      int32_t ei = lg.first_out(cur);
      const Edge& e = g.edges[ei];
      if (e.mult < prune_factor && !e.is_ref) { blocked = true; break; }
      if (seen.count(e.dst)) { blocked = true; break; }
      seen.insert(e.dst);
      path.push_back(e.dst);
      cur = e.dst;
    }
    if (blocked || !(lg.is_ref_vertex(cur) && cur != v)) continue;
    std::vector<int32_t> alt_path(path.rbegin(), path.rend());
    if ((int32_t)alt_path.size() < min_dangling_length + 1) continue;
    std::vector<int32_t> rpath = ref_path_from(lg, alt_path[0], false);
    if (rpath.size() < 3) continue;
    int64_t max_index =
        (int64_t)(rpath.size() < alt_path.size() ? rpath.size() : alt_path.size()) - 1;
    int64_t max_mismatch = max_index / g.k;
    if (max_mismatch < 1) max_mismatch = 1;
    int64_t mism = 0;
    int64_t idx = 1;
    while (idx < max_index) {
      uint8_t rb = (uint8_t)g.vkmer(rpath[idx])[g.k - 1];
      uint8_t ab = (uint8_t)g.vkmer(alt_path[idx])[g.k - 1];
      if (rb != ab) {
        mism++;
        if (mism > max_mismatch) break;
      }
      idx++;
    }
    if (mism > max_mismatch || idx < 2) continue;
    int64_t merge_at = idx - 1;
    if (merge_at + 1 >= (int64_t)rpath.size() || merge_at >= (int64_t)alt_path.size())
      continue;
    lg.add_edge(rpath[merge_at + 1], alt_path[merge_at], 1, false);
  }
}

// rtgraph.py _remove_orphans
void remove_orphans(LiveGraph& lg) {
  Graph& g = *lg.g;
  if (g.ref_path.empty()) return;
  int32_t nv = lg.nv();
  std::vector<uint8_t> fwd(nv, 0), bwd(nv, 0);
  std::vector<int32_t> stack;
  stack.push_back(g.ref_path.front());
  fwd[g.ref_path.front()] = 1;
  while (!stack.empty()) {
    int32_t v = stack.back();
    stack.pop_back();
    for (int32_t ei : g.out[v])
      if (lg.edge_alive[ei] && !fwd[g.edges[ei].dst]) {
        fwd[g.edges[ei].dst] = 1;
        stack.push_back(g.edges[ei].dst);
      }
  }
  stack.push_back(g.ref_path.back());
  bwd[g.ref_path.back()] = 1;
  while (!stack.empty()) {
    int32_t v = stack.back();
    stack.pop_back();
    for (int32_t ei : g.in[v])
      if (lg.edge_alive[ei] && !bwd[g.edges[ei].src]) {
        bwd[g.edges[ei].src] = 1;
        stack.push_back(g.edges[ei].src);
      }
  }
  for (int32_t v = 0; v < nv; v++) {
    if (fwd[v] && bwd[v]) continue;
    for (int32_t ei : g.out[v]) lg.kill(ei);
    for (int32_t ei : g.in[v]) lg.kill(ei);
  }
}

// ---- SeqGraph (seqgraph.py port) ----

struct SGEdge {
  int32_t src, dst;
  int64_t mult;
  uint8_t is_ref;
  uint8_t alive;
};

struct SeqG {
  std::vector<std::string> seqs;
  std::vector<uint8_t> alive;
  std::vector<std::vector<int32_t>> out, inc;  // edge indices, insertion order
  std::vector<int32_t> out_deg, in_deg;        // alive edge counts
  std::vector<SGEdge> edges;

  int32_t add_vertex(std::string s) {
    int32_t vid = (int32_t)seqs.size();
    seqs.push_back(std::move(s));
    alive.push_back(1);
    out.emplace_back();
    inc.emplace_back();
    out_deg.push_back(0);
    in_deg.push_back(0);
    return vid;
  }
  void add_edge(int32_t u, int32_t v, int64_t mult, bool is_ref) {
    for (int32_t ei : out[u]) {
      if (edges[ei].alive && edges[ei].dst == v) {
        edges[ei].mult += mult;
        edges[ei].is_ref |= is_ref;
        return;
      }
    }
    int32_t ei = (int32_t)edges.size();
    edges.push_back({u, v, mult, (uint8_t)(is_ref ? 1 : 0), 1});
    out[u].push_back(ei);
    inc[v].push_back(ei);
    out_deg[u]++;
    in_deg[v]++;
  }
  void kill_edge(int32_t ei) {
    if (!edges[ei].alive) return;
    edges[ei].alive = 0;
    out_deg[edges[ei].src]--;
    in_deg[edges[ei].dst]--;
  }
  void remove_vertex(int32_t v) {
    for (int32_t ei : inc[v]) kill_edge(ei);
    for (int32_t ei : out[v]) kill_edge(ei);
    alive[v] = 0;
  }
  int32_t first_in(int32_t v) const {
    for (int32_t ei : inc[v]) if (edges[ei].alive) return ei;
    return -1;
  }
  int32_t first_out(int32_t v) const {
    for (int32_t ei : out[v]) if (edges[ei].alive) return ei;
    return -1;
  }
  bool is_ref_vertex(int32_t v) const {
    for (int32_t ei : out[v]) if (edges[ei].alive && edges[ei].is_ref) return true;
    for (int32_t ei : inc[v]) if (edges[ei].alive && edges[ei].is_ref) return true;
    return false;
  }
  std::vector<int32_t> out_neighbors(int32_t v) const {
    std::vector<int32_t> r;
    for (int32_t ei : out[v]) if (edges[ei].alive) r.push_back(edges[ei].dst);
    return r;
  }
  std::vector<int32_t> in_neighbors(int32_t v) const {
    std::vector<int32_t> r;
    for (int32_t ei : inc[v]) if (edges[ei].alive) r.push_back(edges[ei].src);
    return r;
  }
  std::vector<int32_t> snapshot() const {
    std::vector<int32_t> r;
    for (int32_t v = 0; v < (int32_t)seqs.size(); v++) if (alive[v]) r.push_back(v);
    return r;
  }
  // edge index of u->v among alive
  int32_t edge_between(int32_t u, int32_t v) const {
    for (int32_t ei : out[u]) if (edges[ei].alive && edges[ei].dst == v) return ei;
    return -1;
  }
};

// seqgraph.py _common_prefix_suffix
void common_prefix_suffix(const std::vector<std::string>& seqs, std::string& prefix,
                          std::string& suffix) {
  size_t min_len = SIZE_MAX;
  for (const auto& s : seqs) min_len = s.size() < min_len ? s.size() : min_len;
  size_t pre = 0;
  while (pre < min_len) {
    char c = seqs[0][pre];
    bool same = true;
    for (const auto& s : seqs) if (s[pre] != c) { same = false; break; }
    if (!same) break;
    pre++;
  }
  size_t suf = 0;
  while (suf < min_len - pre) {
    char c = seqs[0][seqs[0].size() - 1 - suf];
    bool same = true;
    for (const auto& s : seqs) if (s[s.size() - 1 - suf] != c) { same = false; break; }
    if (!same) break;
    suf++;
  }
  prefix = seqs[0].substr(0, pre);
  suffix = suf ? seqs[0].substr(seqs[0].size() - suf) : std::string();
}

// seqgraph.py _split_and_update; top/bottom == -1 means None
void split_and_update(SeqG& sg, const std::vector<int32_t>& middles, int32_t top,
                      int32_t bottom) {
  std::vector<std::string> mseqs;
  for (int32_t m : middles) mseqs.push_back(sg.seqs[m]);
  std::string prefix, suffix;
  common_prefix_suffix(mseqs, prefix, suffix);
  struct Part { int64_t in_mult, out_mult; bool in_ref, out_ref; std::string remaining; };
  std::vector<Part> parts;
  for (int32_t m : middles) {
    int32_t iei = sg.first_in(m), oei = sg.first_out(m);
    Part p;
    if (iei >= 0) { p.in_mult = sg.edges[iei].mult; p.in_ref = sg.edges[iei].is_ref != 0; }
    else { p.in_mult = 0; p.in_ref = sg.is_ref_vertex(m); }
    if (oei >= 0) { p.out_mult = sg.edges[oei].mult; p.out_ref = sg.edges[oei].is_ref != 0; }
    else { p.out_mult = 0; p.out_ref = sg.is_ref_vertex(m); }
    const std::string& s = sg.seqs[m];
    p.remaining = s.substr(prefix.size(), s.size() - suffix.size() - prefix.size());
    parts.push_back(std::move(p));
  }
  for (int32_t m : middles) sg.remove_vertex(m);
  bool need_prefix = !prefix.empty() || top == -1;
  bool need_suffix = !suffix.empty() || bottom == -1;
  int32_t prefix_v = need_prefix ? sg.add_vertex(prefix) : top;
  int32_t suffix_v = need_suffix ? sg.add_vertex(suffix) : bottom;
  if (need_prefix && top != -1) {
    bool any_ref = false;
    for (const auto& p : parts) any_ref |= p.in_ref;
    sg.add_edge(top, prefix_v, 1, any_ref);
  }
  if (need_suffix && bottom != -1) {
    bool any_ref = false;
    for (const auto& p : parts) any_ref |= p.out_ref;
    sg.add_edge(suffix_v, bottom, 1, any_ref);
  }
  for (const auto& p : parts) {
    if (!p.remaining.empty()) {
      int32_t mid_v = sg.add_vertex(p.remaining);
      sg.add_edge(prefix_v, mid_v, p.in_mult, p.in_ref);
      sg.add_edge(mid_v, suffix_v, p.out_mult, p.out_ref);
    } else {
      sg.add_edge(prefix_v, suffix_v, p.in_mult + p.out_mult, p.in_ref || p.out_ref);
    }
  }
}

bool zip_linear_chains(SeqG& sg) {
  std::vector<int32_t> starts;
  for (int32_t v : sg.snapshot()) {
    if (sg.out_deg[v] != 1) continue;
    if (sg.in_deg[v] == 1) {
      int32_t iei = sg.first_in(v);
      int32_t pred = sg.edges[iei].src;
      if (sg.out_deg[pred] <= 1) continue;
    }
    starts.push_back(v);
  }
  bool merged_any = false;
  for (int32_t start : starts) {
    if (!sg.alive[start]) continue;
    std::vector<int32_t> chain{start};
    int32_t cur = start;
    while (true) {
      if (sg.out_deg[cur] != 1) break;
      int32_t nxt = sg.edges[sg.first_out(cur)].dst;
      if (sg.in_deg[nxt] != 1 || nxt == start) break;
      chain.push_back(nxt);
      cur = nxt;
    }
    if (chain.size() == 1) continue;
    merged_any = true;
    std::string new_seq;
    for (int32_t v : chain) new_seq += sg.seqs[v];
    int32_t new_v = sg.add_vertex(std::move(new_seq));
    for (int32_t ei : std::vector<int32_t>(sg.inc[chain.front()])) {
      if (!sg.edges[ei].alive) continue;
      sg.add_edge(sg.edges[ei].src, new_v, sg.edges[ei].mult, sg.edges[ei].is_ref != 0);
    }
    for (int32_t ei : std::vector<int32_t>(sg.out[chain.back()])) {
      if (!sg.edges[ei].alive) continue;
      sg.add_edge(new_v, sg.edges[ei].dst, sg.edges[ei].mult, sg.edges[ei].is_ref != 0);
    }
    for (int32_t v : chain) sg.remove_vertex(v);
  }
  return merged_any;
}

bool merge_diamonds_once(SeqG& sg) {
  bool did = false;
  for (int32_t top : sg.snapshot()) {
    if (!sg.alive[top]) continue;
    std::vector<int32_t> middles = sg.out_neighbors(top);
    if (middles.size() <= 1) continue;
    int32_t bottom = -1;
    bool ok = true;
    for (int32_t m : middles) {
      if (sg.out_deg[m] < 1 || sg.in_deg[m] != 1) { ok = false; break; }
      for (int32_t t : sg.out_neighbors(m)) {
        if (bottom == -1) bottom = t;
        else if (bottom != t) { ok = false; break; }
      }
      if (!ok) break;
    }
    if (!ok || bottom == -1 || sg.in_deg[bottom] != (int32_t)middles.size()) continue;
    std::vector<std::string> mseqs;
    for (int32_t m : middles) mseqs.push_back(sg.seqs[m]);
    std::string prefix, suffix;
    common_prefix_suffix(mseqs, prefix, suffix);
    if (prefix.empty() && suffix.empty()) continue;
    split_and_update(sg, middles, top, bottom);
    did = true;
  }
  return did;
}

constexpr size_t MIN_COMMON_TAIL_TO_MERGE = 10;

bool merge_tails_once(SeqG& sg) {
  bool did = false;
  for (int32_t top : sg.snapshot()) {
    if (!sg.alive[top]) continue;
    std::vector<int32_t> tails = sg.out_neighbors(top);
    if (tails.size() <= 1) continue;
    bool ok = true;
    for (int32_t t : tails)
      if (sg.out_deg[t] > 0 || sg.in_deg[t] > 1) { ok = false; break; }
    if (!ok) continue;
    std::vector<std::string> tseqs;
    for (int32_t t : tails) tseqs.push_back(sg.seqs[t]);
    std::string prefix, suffix;
    common_prefix_suffix(tseqs, prefix, suffix);
    if (suffix.size() < MIN_COMMON_TAIL_TO_MERGE) continue;
    split_and_update(sg, tails, top, -1);
    did = true;
  }
  return did;
}

bool split_common_suffices_once(SeqG& sg, std::unordered_set<int32_t>& already) {
  bool did = false;
  for (int32_t bot : sg.snapshot()) {
    if (!sg.alive[bot] || already.count(bot)) continue;
    already.insert(bot);
    std::vector<int32_t> to_split = sg.in_neighbors(bot);
    if (to_split.size() < 2) continue;
    bool safe = true;
    for (int32_t m : to_split) {
      if (m == bot || sg.out_deg[m] != 1 || sg.edge_between(m, bot) < 0 ||
          sg.edge_between(bot, m) >= 0) { safe = false; break; }
    }
    if (!safe) continue;
    std::vector<std::string> mseqs;
    for (int32_t m : to_split) mseqs.push_back(sg.seqs[m]);
    std::string prefix, suffix;
    common_prefix_suffix(mseqs, prefix, suffix);
    if (suffix.empty()) continue;
    bool blocked = false;
    for (int32_t m : to_split) {
      if (sg.seqs[m].size() == suffix.size() && sg.in_deg[m] == 0 && sg.is_ref_vertex(m)) {
        blocked = true;
        break;
      }
    }
    if (blocked) continue;
    bool all_suffix = true;
    for (int32_t m : to_split)
      if (sg.seqs[m].size() != suffix.size()) { all_suffix = false; break; }
    if (all_suffix) continue;
    for (int32_t m : to_split) {
      int32_t oei = sg.edge_between(m, bot);
      int64_t out_mult = sg.edges[oei].mult;
      bool out_ref = sg.edges[oei].is_ref != 0;
      const std::string s = sg.seqs[m];
      std::string rest = s.substr(0, s.size() - suffix.size());
      int32_t suffix_v = sg.add_vertex(suffix);
      sg.add_edge(suffix_v, bot, out_mult, out_ref);
      int32_t target;
      if (!rest.empty()) {
        int32_t rest_v = sg.add_vertex(std::move(rest));
        sg.add_edge(rest_v, suffix_v, 1, out_ref);
        target = rest_v;
      } else {
        target = suffix_v;
      }
      for (int32_t ei : std::vector<int32_t>(sg.inc[m])) {
        if (!sg.edges[ei].alive) continue;
        sg.add_edge(sg.edges[ei].src, target, sg.edges[ei].mult, sg.edges[ei].is_ref != 0);
      }
    }
    for (int32_t m : to_split) sg.remove_vertex(m);
    did = true;
  }
  return did;
}

bool merge_common_suffices_once(SeqG& sg) {
  bool did = false;
  for (int32_t v : sg.snapshot()) {
    if (!sg.alive[v]) continue;
    std::vector<int32_t> prevs = sg.in_neighbors(v);
    if (prevs.empty()) continue;
    const std::string first_seq = sg.seqs[prevs[0]];
    bool ok = prevs.size() > 1;
    for (int32_t p : prevs) {
      if (sg.seqs[p] != first_seq || sg.out_deg[p] != 1 || sg.edge_between(p, v) < 0 ||
          sg.in_deg[p] == 0) { ok = false; break; }
    }
    if (!ok) continue;
    int32_t new_v = sg.add_vertex(first_seq + sg.seqs[v]);
    for (int32_t p : prevs) {
      for (int32_t ei : std::vector<int32_t>(sg.inc[p])) {
        if (!sg.edges[ei].alive) continue;
        sg.add_edge(sg.edges[ei].src, new_v, sg.edges[ei].mult, sg.edges[ei].is_ref != 0);
      }
    }
    for (int32_t ei : std::vector<int32_t>(sg.out[v])) {
      if (!sg.edges[ei].alive) continue;
      sg.add_edge(new_v, sg.edges[ei].dst, sg.edges[ei].mult, sg.edges[ei].is_ref != 0);
    }
    for (int32_t p : prevs) sg.remove_vertex(p);
    sg.remove_vertex(v);
    did = true;
  }
  return did;
}

void simplify(SeqG& sg, int max_cycles = 100) {
  zip_linear_chains(sg);
  for (int c = 0; c < max_cycles; c++) {
    bool did = false;
    while (merge_diamonds_once(sg)) did = true;
    while (merge_tails_once(sg)) did = true;
    std::unordered_set<int32_t> already;
    while (split_common_suffices_once(sg, already)) did = true;
    while (merge_common_suffices_once(sg)) did = true;
    did |= zip_linear_chains(sg);
    if (!did) break;
  }
}

// seqgraph.py find_k_best_haplotypes
struct HapOut {
  std::string bases;
  double score;
  int64_t weakness;
};

struct PathNode { int32_t vid; int32_t parent; };

std::vector<HapOut> find_k_best_haplotypes(const SeqG& sg, int32_t max_paths,
                                           int64_t max_pop = 100000) {
  int32_t src = -1, sink = -1;
  for (int32_t v : sg.snapshot()) {
    bool out_ref = false, in_ref = false;
    for (int32_t ei : sg.out[v]) if (sg.edges[ei].alive && sg.edges[ei].is_ref) { out_ref = true; break; }
    for (int32_t ei : sg.inc[v]) if (sg.edges[ei].alive && sg.edges[ei].is_ref) { in_ref = true; break; }
    if (src == -1 && out_ref && !in_ref) src = v;
    if (sink == -1 && in_ref && !out_ref) sink = v;
    if (src != -1 && sink != -1) break;
  }
  std::vector<HapOut> results;
  if (src == -1 || sink == -1) return results;

  struct Entry {
    double neg_score;
    int64_t tiebreak;
    int32_t vid;
    int32_t node;  // index into path arena
    int64_t weakness;
  };
  struct Cmp {
    bool operator()(const Entry& a, const Entry& b) const {
      if (a.neg_score != b.neg_score) return a.neg_score > b.neg_score;  // min-heap
      return a.tiebreak > b.tiebreak;
    }
  };
  std::vector<PathNode> arena;
  arena.push_back({src, -1});
  std::priority_queue<Entry, std::vector<Entry>, Cmp> heap;
  heap.push({0.0, 0, src, 0, (int64_t)1 << 30});
  int64_t counter = 0, pops = 0;
  while (!heap.empty() && (int32_t)results.size() < max_paths && pops < max_pop) {
    Entry e = heap.top();
    heap.pop();
    pops++;
    if (e.vid == sink) {
      // collect path
      std::vector<int32_t> vids;
      for (int32_t n = e.node; n != -1; n = arena[n].parent) vids.push_back(arena[n].vid);
      std::string bases;
      for (auto it = vids.rbegin(); it != vids.rend(); ++it) bases += sg.seqs[*it];
      results.push_back({std::move(bases), -e.neg_score, e.weakness});
      continue;
    }
    int64_t total = 0;
    bool any = false;
    for (int32_t ei : sg.out[e.vid])
      if (sg.edges[ei].alive) { total += sg.edges[ei].mult; any = true; }
    if (!any || total <= 0) continue;
    for (int32_t ei : sg.out[e.vid]) {
      if (!sg.edges[ei].alive) continue;
      int32_t tgt = sg.edges[ei].dst;
      int64_t mult = sg.edges[ei].mult;
      // cycle check: tgt in path
      bool in_path = false;
      for (int32_t n = e.node; n != -1; n = arena[n].parent)
        if (arena[n].vid == tgt) { in_path = true; break; }
      if (in_path) continue;
      if (mult <= 0) continue;
      counter++;
      double sc = e.neg_score - (std::log10((double)mult) - std::log10((double)total));
      int64_t wk = total == mult ? e.weakness
                                 : (mult < e.weakness ? mult : e.weakness);
      int32_t node = (int32_t)arena.size();
      arena.push_back({tgt, e.node});
      heap.push({sc, counter, tgt, node, wk});
    }
  }
  return results;
}

// assembly pipeline result held behind the handle
struct AsmResult {
  int32_t status = 0;
  std::vector<HapOut> haps;
  int64_t total_bases = 0;
};

}  // namespace

extern "C" {

// Full assembly attempt at one kmer size. status: 0 ok (haps exported),
// 1/2 build errors (rtg_build error codes), 3 graph has cycles (retry larger
// k), 4 low-quality graph (retry larger k), 5 no ref path post-recovery.
void* rtg_assemble(int32_t kmer_size, const uint8_t* seq_data,
                   const int64_t* seq_off, const int64_t* seq_start,
                   const int64_t* seq_stop, const int64_t* seq_count,
                   const uint8_t* seq_is_ref, int64_t n_seqs,
                   int32_t prune_factor, int32_t recover_dangling,
                   int32_t num_best, int32_t* out_status, int64_t* out_n_haps,
                   int64_t* out_total_bases) {
  auto* res = new (std::nothrow) AsmResult();
  if (!res) return nullptr;
  int64_t nv_tmp, ne_tmp, nrp_tmp, nnu_tmp;
  int32_t err = 0;
  Graph* g = static_cast<Graph*>(
      rtg_build(kmer_size, seq_data, seq_off, seq_start, seq_stop, seq_count,
                seq_is_ref, n_seqs, &nv_tmp, &ne_tmp, &nrp_tmp, &nnu_tmp, &err));
  if (!g) { delete res; return nullptr; }
  auto finish = [&](int32_t status) {
    res->status = status;
    *out_status = status;
    *out_n_haps = (int64_t)res->haps.size();
    res->total_bases = 0;
    for (const auto& h : res->haps) res->total_bases += (int64_t)h.bases.size();
    *out_total_bases = res->total_bases;
    delete g;
    return (void*)res;
  };
  if (err) return finish(err);
  if (graph_has_cycles(*g)) return finish(3);
  // is_low_quality: non_unique*4 > tracked unique kmers
  if ((int64_t)g->non_unique.size() * 4 > (int64_t)g->kmer_to_vertex.size())
    return finish(4);

  LiveGraph lg(g);
  prune_low_weight_chains(lg, prune_factor);
  if (!recover_dangling) {
    remove_orphans(lg);
  } else {
    int32_t recovery_pf = prune_factor;
    recover_dangling_tails(lg, recovery_pf, 4);
    recover_dangling_heads(lg, recovery_pf, 4);
    remove_orphans(lg);
  }
  if (g->ref_path.empty()) return finish(5);

  // SeqGraph conversion (seqgraph.py from_read_threading_graph)
  SeqG sg;
  {
    int32_t nv = lg.nv();
    std::vector<int32_t> id_map(nv, -1);
    for (int32_t v = 0; v < nv; v++) {
      if (lg.in_deg[v] == 0 && lg.out_deg[v] == 0) continue;
      std::string_view km = g->vkmer(v);
      std::string s = lg.in_deg[v] == 0 ? std::string(km)
                                        : std::string(1, km[g->k - 1]);
      id_map[v] = sg.add_vertex(std::move(s));
    }
    for (int32_t u = 0; u < nv; u++) {
      if (id_map[u] < 0) continue;
      for (int32_t ei : g->out[u]) {
        if (!lg.edge_alive[ei]) continue;
        const Edge& e = g->edges[ei];
        if (id_map[e.dst] < 0) continue;
        sg.add_edge(id_map[u], id_map[e.dst], e.mult, e.is_ref != 0);
      }
    }
  }
  simplify(sg);
  res->haps = find_k_best_haplotypes(sg, num_best);
  return finish(0);
}

void rtg_asm_export(void* handle, uint8_t* bases_out, int64_t* hap_len_out,
                    double* score_out, int64_t* weakness_out) {
  auto* res = static_cast<AsmResult*>(handle);
  size_t off = 0;
  for (size_t i = 0; i < res->haps.size(); i++) {
    const HapOut& h = res->haps[i];
    std::memcpy(bases_out + off, h.bases.data(), h.bases.size());
    off += h.bases.size();
    hap_len_out[i] = (int64_t)h.bases.size();
    score_out[i] = h.score;
    weakness_out[i] = h.weakness;
  }
}

void rtg_asm_free(void* handle) { delete static_cast<AsmResult*>(handle); }
}
