"""Sparse graph primitives: masked segment ops, fused graph attention.

These replace the reference's external CUDA kernels (torch-scatter `scatter`,
torch-geometric `utils.softmax` / `MessagePassing.propagate`; see reference
modeling/modeling_qagnn.py:371-484) with TPU-native XLA/Pallas formulations
over fixed-shape masked edge arrays.
"""

from qagnn_tpu.ops.segment import (
    segment_sum,
    segment_max,
    segment_softmax,
    segment_softmax_with_self_loops,
    out_degree,
    aggregate_onehot,
)
from qagnn_tpu.ops.gat_attention import (
    relational_gat_attention,
    relational_gat_attention_nodes,
)

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_softmax",
    "segment_softmax_with_self_loops",
    "out_degree",
    "aggregate_onehot",
    "relational_gat_attention",
    "relational_gat_attention_nodes",
]
