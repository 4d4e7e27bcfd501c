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
