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
