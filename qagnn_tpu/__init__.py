"""qagnn_tpu — a TPU-native graph-attention framework for LM+KG question answering.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of QA-GNN
(michiyasunaga/qagnn): joint language-model + knowledge-graph reasoning for
multiple-choice QA via relation-aware multi-head graph attention over
per-question knowledge-graph subgraphs.

Design (TPU-first, not a port):
  * fixed-shape padded edge buckets per graph (static shapes for XLA),
  * dense analytic self-loop path fused into the segment softmax,
  * masked batch statistics matching variable-length semantics,
  * one jitted train step (LM fwd + GNN fwd + loss + bwd + optimizer),
  * `jax.sharding.Mesh` ('dp','mp') scaling via pjit/shard_map,
  * Pallas kernels for the fused SDDMM -> segment-softmax -> SpMM hot path.
"""

__version__ = "0.1.0"

from qagnn_tpu import graph, ops  # noqa: F401
