"""Edge-partitioned GNN sharding: the TPU analog of sequence parallelism.

The reference has no distributed mode at all (its only multi-device feature
is a serial 2-GPU encoder/decoder split, reference qagnn.py:132-140). The
scaling dimension of this workload is EDGES in the batched subgraphs
(SURVEY §5): so in addition to sharding graphs across the `data` axis, the
per-graph edge arrays (G, E) can be sharded along E across the `model` axis.

With the one-hot/segment formulation in qagnn_tpu.ops.gat_attention every
cross-shard interaction is a sum over the E axis (denominators, degrees, the
SpMM contraction), so under GSPMD the sharded edge axis lowers to local
partial reductions + one psum over `model` per reduction — boundary-node
exchange expressed declaratively, with XLA free to overlap the collectives
with local work. Node arrays stay sharded on `data` only (replicated over
`model`), so the gathers stay local.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qagnn_tpu.graph.container import BatchedGraphs
from qagnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def graph_shardings(mesh: Mesh, edge_partition: bool = True) -> BatchedGraphs:
    """A BatchedGraphs-shaped pytree of NamedShardings.

    Node arrays: (G, ...) -> (data, replicated...). Edge arrays: (G, E) ->
    (data, model) when edge_partition, else (data, replicated).
    """
    node = NamedSharding(mesh, P(DATA_AXIS))
    edge = NamedSharding(
        mesh, P(DATA_AXIS, MODEL_AXIS if edge_partition else None))
    return BatchedGraphs(
        concept_ids=node, node_types=node, node_scores=node, num_nodes=node,
        edge_src=edge, edge_dst=edge, edge_type=edge, edge_mask=edge)


def shard_graph(graph: BatchedGraphs, mesh: Mesh,
                edge_partition: bool = True) -> BatchedGraphs:
    """device_put a host BatchedGraphs with edge partitioning."""
    shardings = graph_shardings(mesh, edge_partition)
    return jax.tree.map(
        lambda x, s: jax.device_put(jax.numpy.asarray(x), s),
        graph, shardings)
