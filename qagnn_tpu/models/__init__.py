"""Model layer: flax.linen modules for the QA-GNN family."""

from qagnn_tpu.models.norm import MaskedBatchNorm
from qagnn_tpu.models.layers import (
    gelu,
    MLP,
    MultiheadAttPoolLayer,
    CustomizedEmbedding,
    TypedLinear,
    masked_softmax,
)
from qagnn_tpu.models.gnn import GATConvE, QAGNNMessagePassing
from qagnn_tpu.models.qagnn import QAGNN, LMQAGNN

__all__ = [
    "MaskedBatchNorm",
    "gelu",
    "MLP",
    "MultiheadAttPoolLayer",
    "CustomizedEmbedding",
    "TypedLinear",
    "masked_softmax",
    "GATConvE",
    "QAGNNMessagePassing",
    "QAGNN",
    "LMQAGNN",
]
