"""Fixed-shape batched-subgraph containers and host-side batching utilities."""

from qagnn_tpu.graph.container import BatchedGraphs
from qagnn_tpu.graph.batching import batch_edge_lists, pick_edge_bucket, EDGE_BUCKETS

__all__ = ["BatchedGraphs", "batch_edge_lists", "pick_edge_bucket", "EDGE_BUCKETS"]
