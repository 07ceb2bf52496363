// Host-side graph batch packer: variable-length COO edge lists -> fixed
// (G, E) padded buckets with masks, optionally sorted by source node.
//
// Native replacement for the python loop in qagnn_tpu/graph/batching.py
// (itself replacing the reference's dynamic batch_graph concat,
// reference modeling/modeling_qagnn.py:244-251). The packer runs on every
// training batch on the host; at CSQA scale (64 graphs x ~6k edges per
// batch) the python/numpy version costs milliseconds per batch that this
// C++ version does in tens of microseconds.
//
// C ABI only (consumed via ctypes): no C++ types cross the boundary.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Pack edges for a batch of graphs.
//   flat_src/flat_dst/flat_type: concatenated per-graph edge arrays
//   lengths[g]: number of edges of graph g (sum == len(flat_*))
//   n_graphs, edges_per_graph: output bucket shape
//   sort_by_src: stable-sort each graph's edges by source node
// Outputs (preallocated by caller, shape (n_graphs, edges_per_graph)):
//   out_src, out_dst, out_type: int32, padded with 0
//   out_mask: uint8 (bool), 1 for real edges
// Edges beyond the bucket are truncated (keeping the lowest-index edges,
// matching qagnn_tpu/graph/batching.py).
void pack_edges(const int32_t* flat_src, const int32_t* flat_dst,
                const int32_t* flat_type, const int64_t* lengths,
                int64_t n_graphs, int64_t edges_per_graph, int sort_by_src,
                int32_t* out_src, int32_t* out_dst, int32_t* out_type,
                uint8_t* out_mask) {
  std::vector<int64_t> counts;
  int64_t offset = 0;
  for (int64_t g = 0; g < n_graphs; ++g) {
    const int64_t len = lengths[g];
    const int64_t e = std::min(len, edges_per_graph);
    const int32_t* src = flat_src + offset;
    const int32_t* dst = flat_dst + offset;
    const int32_t* typ = flat_type + offset;
    int32_t* osrc = out_src + g * edges_per_graph;
    int32_t* odst = out_dst + g * edges_per_graph;
    int32_t* otyp = out_type + g * edges_per_graph;
    uint8_t* omask = out_mask + g * edges_per_graph;

    if (sort_by_src) {
      // counting sort: src ids are small node indices, so O(E + N) beats
      // comparison sort by ~10x at these sizes (and is stable)
      int32_t max_src = 0;
      for (int64_t i = 0; i < e; ++i) max_src = std::max(max_src, src[i]);
      counts.assign(max_src + 2, 0);
      for (int64_t i = 0; i < e; ++i) ++counts[src[i] + 1];
      for (int32_t v = 0; v <= max_src; ++v) counts[v + 1] += counts[v];
      for (int64_t i = 0; i < e; ++i) {
        const int64_t pos = counts[src[i]]++;
        osrc[pos] = src[i];
        odst[pos] = dst[i];
        otyp[pos] = typ[i];
      }
    } else {
      std::memcpy(osrc, src, e * sizeof(int32_t));
      std::memcpy(odst, dst, e * sizeof(int32_t));
      std::memcpy(otyp, typ, e * sizeof(int32_t));
    }
    std::memset(omask, 1, e);
    if (e < edges_per_graph) {
      std::memset(osrc + e, 0, (edges_per_graph - e) * sizeof(int32_t));
      std::memset(odst + e, 0, (edges_per_graph - e) * sizeof(int32_t));
      std::memset(otyp + e, 0, (edges_per_graph - e) * sizeof(int32_t));
      std::memset(omask + e, 0, edges_per_graph - e);
    }
    offset += len;
  }
}

// Same as pack_edges but consuming per-graph pointer arrays directly —
// avoids the host-side concatenate+copy entirely. edge_index_ptrs[g] points
// at graph g's (2, len) int32 COO block (row 0 = src, row 1 = dst);
// type_ptrs[g] at its (len,) int32 relation ids.
void pack_edges_ptrs(const int32_t* const* edge_index_ptrs,
                     const int32_t* const* type_ptrs, const int64_t* lengths,
                     int64_t n_graphs, int64_t edges_per_graph,
                     int sort_by_src, int32_t* out_src, int32_t* out_dst,
                     int32_t* out_type, uint8_t* out_mask) {
  std::vector<int64_t> counts;
  for (int64_t g = 0; g < n_graphs; ++g) {
    const int64_t len = lengths[g];
    const int64_t e = std::min(len, edges_per_graph);
    const int32_t* src = edge_index_ptrs[g];
    const int32_t* dst = edge_index_ptrs[g] + len;
    const int32_t* typ = type_ptrs[g];
    int32_t* osrc = out_src + g * edges_per_graph;
    int32_t* odst = out_dst + g * edges_per_graph;
    int32_t* otyp = out_type + g * edges_per_graph;
    uint8_t* omask = out_mask + g * edges_per_graph;

    if (sort_by_src) {
      // counting sort: src ids are small node indices, so O(E + N) beats
      // comparison sort by ~10x at these sizes (and is stable)
      int32_t max_src = 0;
      for (int64_t i = 0; i < e; ++i) max_src = std::max(max_src, src[i]);
      counts.assign(max_src + 2, 0);
      for (int64_t i = 0; i < e; ++i) ++counts[src[i] + 1];
      for (int32_t v = 0; v <= max_src; ++v) counts[v + 1] += counts[v];
      for (int64_t i = 0; i < e; ++i) {
        const int64_t pos = counts[src[i]]++;
        osrc[pos] = src[i];
        odst[pos] = dst[i];
        otyp[pos] = typ[i];
      }
    } else {
      std::memcpy(osrc, src, e * sizeof(int32_t));
      std::memcpy(odst, dst, e * sizeof(int32_t));
      std::memcpy(otyp, typ, e * sizeof(int32_t));
    }
    std::memset(omask, 1, e);
    if (e < edges_per_graph) {
      std::memset(osrc + e, 0, (edges_per_graph - e) * sizeof(int32_t));
      std::memset(odst + e, 0, (edges_per_graph - e) * sizeof(int32_t));
      std::memset(otyp + e, 0, (edges_per_graph - e) * sizeof(int32_t));
      std::memset(omask + e, 0, edges_per_graph - e);
    }
  }
}

// Gather rows for a batch: out[i] = table[idx[i]] over int32 tables.
// Used to slice per-question node arrays without a python loop.
void gather_rows_i32(const int32_t* table, const int64_t* idx,
                     int64_t n_idx, int64_t row_len, int32_t* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(out + i * row_len, table + idx[i] * row_len,
                row_len * sizeof(int32_t));
  }
}

void gather_rows_f32(const float* table, const int64_t* idx, int64_t n_idx,
                     int64_t row_len, float* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(out + i * row_len, table + idx[i] * row_len,
                row_len * sizeof(float));
  }
}

}  // extern "C"
