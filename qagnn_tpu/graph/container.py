"""BatchedGraphs — the framework's fixed-shape batched-subgraph container.

The reference batches per-example variable-length COO edge lists into one
disjoint graph with a dynamic total edge count (reference
modeling/modeling_qagnn.py:244-251) — fine for CUDA, hostile to XLA, which
traces and compiles one program per shape.

Here every batch is a pytree of STATIC-shape arrays:

  * node arrays keep a leading graph dimension (G, N, ...) so a data-parallel
    mesh can shard the G axis uniformly across devices, and
  * edge arrays are per-graph fixed buckets (G, E) with LOCAL node indices in
    [0, N) plus a boolean mask for padding. Local indices keep edge entries
    device-local under G-axis sharding — no cross-device gathers.

Self-loops are NOT stored (the model adds them analytically; see
qagnn_tpu.ops.segment.segment_softmax_with_self_loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class BatchedGraphs:
    """A batch of G independent subgraphs, each padded to N nodes / E edges.

    Mirrors the information content of the reference's per-batch GNN inputs
    (concept_ids, node_type_ids, node_scores, adj_lengths, edge_index,
    edge_type — reference utils/data_utils.py:79-197) in fixed shapes.
    """

    concept_ids: Array   # (G, N) int32 — 0 = context node, >=1 = entity id + 1
    node_types: Array    # (G, N) int32 — 0 q-entity, 1 a-entity, 2 other, 3 context
    node_scores: Array   # (G, N) float32 — LM relevance score per node
    num_nodes: Array     # (G,) int32 — real node count incl. context node
    edge_src: Array      # (G, E) int32 — local source node index
    edge_dst: Array      # (G, E) int32 — local destination node index
    edge_type: Array     # (G, E) int32 — relation id
    edge_mask: Array     # (G, E) bool — False for padded edge slots

    @property
    def n_graphs(self) -> int:
        return self.concept_ids.shape[0]

    @property
    def nodes_per_graph(self) -> int:
        return self.concept_ids.shape[1]

    @property
    def edges_per_graph(self) -> int:
        return self.edge_src.shape[1]

    @property
    def node_mask(self) -> Array:
        """(G, N) bool — True for real (non-padding) nodes."""
        ar = jnp.arange(self.nodes_per_graph, dtype=self.num_nodes.dtype)
        return ar[None, :] < self.num_nodes[:, None]

    # ---- flat views over the disjoint union of all graphs ---------------
    # Node g,n gets global index g*N + n, matching the reference's
    # batch_graph offsetting (modeling/modeling_qagnn.py:248).

    @property
    def total_nodes(self) -> int:
        return self.n_graphs * self.nodes_per_graph

    def _offsets(self) -> Array:
        g = jnp.arange(self.n_graphs, dtype=jnp.int32) * self.nodes_per_graph
        return g[:, None]

    @property
    def flat_edge_src(self) -> Array:
        """(G*E,) global source indices."""
        return (self.edge_src + self._offsets()).reshape(-1)

    @property
    def flat_edge_dst(self) -> Array:
        """(G*E,) global destination indices."""
        return (self.edge_dst + self._offsets()).reshape(-1)

    @property
    def flat_edge_type(self) -> Array:
        return self.edge_type.reshape(-1)

    @property
    def flat_edge_mask(self) -> Array:
        return self.edge_mask.reshape(-1)

    def real_edge_count(self) -> Array:
        """Total number of real edges in the batch (scalar int32)."""
        return jnp.sum(self.edge_mask.astype(jnp.int32))
