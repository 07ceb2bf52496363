"""Data layer: statement tokenization, subgraph loading, batch iteration."""

from qagnn_tpu.data.statements import StatementData, load_statements, read_statement_jsonl
from qagnn_tpu.data.graphs import GraphData, load_graph_pk
from qagnn_tpu.data.loader import QAGNNDataLoader, Split

__all__ = [
    "StatementData", "load_statements", "read_statement_jsonl",
    "GraphData", "load_graph_pk", "QAGNNDataLoader", "Split",
]
