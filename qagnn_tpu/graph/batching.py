"""Host-side (numpy) batching of variable-length edge lists into fixed buckets.

Replaces the reference's dynamic-shape LM_QAGNN.batch_graph
(modeling/modeling_qagnn.py:244-251): instead of concatenating per-example COO
lists into one dynamic-E array, each graph's edges are padded/truncated into a
fixed per-graph budget chosen from a small set of buckets, so XLA compiles a
handful of programs instead of one per batch shape.

Edges are optionally sorted by source node within each graph — semantics are
permutation-invariant (all downstream ops are segment reductions), and sorted
edges give the Pallas kernels contiguous segment runs.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from qagnn_tpu.graph.container import BatchedGraphs


def _native_lib():
    """C++ packer (qagnn_tpu/native/packer.cc), or None without a toolchain."""
    try:
        from qagnn_tpu.native import load_native
        return load_native()
    except Exception:
        return None


def _pack_native(lib, edge_indices, edge_types, n_graphs, edges_per_graph,
                 sort_by_src):
    import ctypes

    lengths = np.asarray([ei.shape[1] for ei in edge_indices], np.int64)
    if lengths.sum() == 0:
        z = np.zeros((n_graphs, edges_per_graph), np.int32)
        return z, z.copy(), z.copy(), np.zeros_like(z, bool)

    # zero-copy when inputs are already contiguous int32 (the loader emits
    # exactly that); otherwise convert per graph
    eis = [np.ascontiguousarray(ei, np.int32) for ei in edge_indices]
    ets = [np.ascontiguousarray(et, np.int32) for et in edge_types]

    i32p = ctypes.POINTER(ctypes.c_int32)
    ei_ptrs = (i32p * n_graphs)(
        *[e.ctypes.data_as(i32p) for e in eis])
    et_ptrs = (i32p * n_graphs)(
        *[t.ctypes.data_as(i32p) for t in ets])

    src = np.empty((n_graphs, edges_per_graph), np.int32)
    dst = np.empty((n_graphs, edges_per_graph), np.int32)
    typ = np.empty((n_graphs, edges_per_graph), np.int32)
    mask = np.empty((n_graphs, edges_per_graph), np.uint8)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.pack_edges_ptrs(ei_ptrs, et_ptrs, p(lengths, ctypes.c_int64),
                        n_graphs, edges_per_graph, int(sort_by_src),
                        p(src, ctypes.c_int32), p(dst, ctypes.c_int32),
                        p(typ, ctypes.c_int32), p(mask, ctypes.c_uint8))
    return src, dst, typ, mask.astype(bool)

# Power-of-two-ish edge buckets; the largest comfortably covers CSQA's ~6k
# directed edges per subgraph after inverse/context augmentation
# (reference utils/data_utils.py:103 notes ~2905 stored entries pre-doubling).
EDGE_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384)


def pick_edge_bucket(max_real_edges: int,
                     buckets: Sequence[int] = EDGE_BUCKETS) -> int:
    """Smallest bucket that fits `max_real_edges` (else the largest bucket)."""
    for b in buckets:
        if max_real_edges <= b:
            return b
    return buckets[-1]


def batch_edge_lists(
    edge_indices: Sequence[np.ndarray],   # list of (2, E_i) int arrays, local node ids
    edge_types: Sequence[np.ndarray],     # list of (E_i,) int arrays
    concept_ids: np.ndarray,              # (G, N)
    node_types: np.ndarray,               # (G, N)
    node_scores: np.ndarray,              # (G, N)
    num_nodes: np.ndarray,                # (G,)
    edges_per_graph: int | None = None,
    sort_by_src: bool = True,
    buckets: Sequence[int] = EDGE_BUCKETS,
) -> BatchedGraphs:
    """Pack per-graph COO edge lists into a BatchedGraphs pytree (numpy arrays).

    Edges beyond the budget are truncated (with a stable preference for keeping
    low-index edges, which in the reference layout are the forward relations
    and context edges before the appended inverses).
    """
    n_graphs = len(edge_indices)
    assert len(edge_types) == n_graphs == concept_ids.shape[0]

    if edges_per_graph is None:
        max_e = max((ei.shape[1] for ei in edge_indices), default=0)
        edges_per_graph = pick_edge_bucket(max_e, buckets)

    # The reference never drops edges (dynamic edge lists); a bucket smaller
    # than a graph's true edge count silently changes semantics, so surface
    # it loudly. The loader picks the bucket from the split's true max, so
    # this only fires for an explicit/undersized edges_per_graph or a graph
    # beyond the largest bucket.
    n_dropped = sum(max(0, ei.shape[1] - edges_per_graph)
                    for ei in edge_indices)
    if n_dropped:
        import warnings
        n_over = sum(ei.shape[1] > edges_per_graph for ei in edge_indices)
        warnings.warn(
            f"edge budget {edges_per_graph} truncates {n_dropped} edges "
            f"across {n_over}/{n_graphs} graphs (max real edge count "
            f"{max(ei.shape[1] for ei in edge_indices)}); results will "
            f"diverge from the reference, which never drops edges",
            stacklevel=2)

    native = _native_lib()
    if native is not None:
        src, dst, typ, mask = _pack_native(
            native, edge_indices, edge_types, n_graphs, edges_per_graph,
            sort_by_src)
    else:
        src = np.zeros((n_graphs, edges_per_graph), dtype=np.int32)
        dst = np.zeros((n_graphs, edges_per_graph), dtype=np.int32)
        typ = np.zeros((n_graphs, edges_per_graph), dtype=np.int32)
        mask = np.zeros((n_graphs, edges_per_graph), dtype=bool)

        for g, (ei, et) in enumerate(zip(edge_indices, edge_types)):
            e = min(ei.shape[1], edges_per_graph)
            s, d, t = ei[0, :e], ei[1, :e], et[:e]
            if sort_by_src:
                order = np.argsort(s, kind="stable")
                s, d, t = s[order], d[order], t[order]
            src[g, :e] = s
            dst[g, :e] = d
            typ[g, :e] = t
            mask[g, :e] = True

    return BatchedGraphs(
        concept_ids=concept_ids.astype(np.int32),
        node_types=node_types.astype(np.int32),
        node_scores=node_scores.astype(np.float32),
        num_nodes=num_nodes.astype(np.int32),
        edge_src=src,
        edge_dst=dst,
        edge_type=typ,
        edge_mask=mask,
    )
