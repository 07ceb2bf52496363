"""Fused relation-aware graph-attention core: SDDMM -> segment-softmax -> SpMM.

This is the compute heart of the framework — the TPU-native replacement for
the reference's GATConvE.message + propagate pair
(reference modeling/modeling_qagnn.py:455-484, 442), which there is delegated
to torch-geometric/torch-scatter CUDA kernels.

Semantics (per edge e = (src, dst), per head h):
    score[e,h]  = <query[e,h,:], key[e,h,:]>                  (SDDMM)
    alpha       = softmax over each SOURCE node's outgoing edges, jointly with
                  that node's self-loop (source-grouped — the reference's
                  unusual choice, modeling/modeling_qagnn.py:471-472)
    alpha      *= out_degree(src)  (edges + self-loop,
                  modeling/modeling_qagnn.py:476-481)
    out[n,h,:]  = sum over edges with dst==n of alpha[e,h] * msg[e,h,:]
                  + alpha_self[n,h] * msg_self[n,h,:]         (SpMM)

The projections producing query/key/msg are plain GEMMs and live in the model
layer where XLA maps them onto the MXU; this op handles only the sparse part.

A Pallas fused kernel (qagnn_tpu.ops.pallas) can replace this XLA reference
path; both produce identical results and are cross-checked in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qagnn_tpu.ops.segment import (
    out_degree,
    segment_softmax_with_self_loops,
    segment_sum,
)

Array = jax.Array


def relational_gat_attention(
    edge_query: Array,   # (E, H, D) — projected from the SOURCE node
    edge_key: Array,     # (E, H, D)
    edge_msg: Array,     # (E, H, D)
    edge_src: Array,     # (E,) int32 node index of source
    edge_dst: Array,     # (E,) int32 node index of destination
    edge_mask: Array,    # (E,) bool — False for padding
    self_query: Array,   # (N, H, D) — self-loop path, one per node
    self_key: Array,     # (N, H, D)
    self_msg: Array,     # (N, H, D)
    *,
    return_alpha: bool = False,
):
    """Returns aggregated node features (N, H*D); optionally (edge_alpha, self_alpha).

    Note: `query` is expected to be pre-scaled by 1/sqrt(D) by the caller
    (mirroring reference modeling/modeling_qagnn.py:469).
    """
    num_nodes = self_query.shape[0]
    n_heads, dim_per_head = edge_query.shape[1], edge_query.shape[2]

    # --- SDDMM: per-edge attention logits -------------------------------
    edge_scores = jnp.sum(edge_query * edge_key, axis=-1)   # (E, H)
    self_scores = jnp.sum(self_query * self_key, axis=-1)   # (N, H)

    # --- source-grouped softmax over {outgoing edges} ∪ {self-loop} -----
    edge_alpha, self_alpha = segment_softmax_with_self_loops(
        edge_scores, edge_src, edge_mask, self_scores)

    # --- out-degree rescale (edges + self-loop) --------------------------
    deg = out_degree(edge_src, num_nodes, edge_mask, include_self_loop=True)
    edge_alpha_scaled = edge_alpha * deg[edge_src][:, None]
    self_alpha_scaled = self_alpha * deg[:, None]

    # --- SpMM: weighted scatter-add to destinations ----------------------
    weighted = edge_msg * edge_alpha_scaled[:, :, None]          # (E, H, D)
    aggr = segment_sum(weighted, edge_dst, num_nodes, edge_mask)  # (N, H, D)
    aggr = aggr + self_msg * self_alpha_scaled[:, :, None]

    out = aggr.reshape(num_nodes, n_heads * dim_per_head)
    if return_alpha:
        return out, (edge_alpha, self_alpha)
    return out
