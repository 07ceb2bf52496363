"""QAGNN decoder and LM+GNN top-level model.

TPU-native equivalents of reference modeling/modeling_qagnn.py:99-189 (QAGNN)
and :192-251 (LM_QAGNN). One jitted program: LM encoder, GNN decoder, scorer.
The (batch, choice) merge happens on fixed shapes; graphs arrive pre-batched
as a BatchedGraphs pytree (no dynamic edge concat — compare the reference's
batch_graph at modeling/modeling_qagnn.py:244-251).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from qagnn_tpu.graph.container import BatchedGraphs
from qagnn_tpu.models.gnn import QAGNNMessagePassing
from qagnn_tpu.models.layers import (
    MLP,
    CustomizedEmbedding,
    MultiheadAttPoolLayer,
    gelu,
    normal_init,
)

Array = jax.Array


def normalize_node_scores(node_scores: Array, node_mask: Array,
                          num_nodes: Array) -> Array:
    """Reference score normalization (modeling/modeling_qagnn.py:159-167).

    node_scores: (G, N) raw LM relevance scores; node_mask: (G, N) bool with
    True for real nodes; num_nodes: (G,). Returns normalized (G, N).
    """
    s = -node_scores
    s = s - s[:, 0:1]
    s = s * node_mask.astype(s.dtype)
    mean_norm = jnp.sum(jnp.abs(s), axis=1) / num_nodes.astype(s.dtype)
    return s / (mean_norm[:, None] + 1e-05)


class QAGNN(nn.Module):
    """GNN decoder: context-node projection + concept embedding + k-layer MP
    + attention pooling + final MLP scorer (reference modeling/modeling_qagnn.py:99-189).
    """

    k: int
    n_ntype: int
    n_etype: int
    sent_dim: int
    n_concept: int
    concept_dim: int
    concept_in_dim: int
    n_attention_head: int
    fc_dim: int
    n_fc_layer: int
    p_emb: float = 0.2
    p_gnn: float = 0.2
    p_fc: float = 0.2
    init_std: float = 0.02
    gnn_backend: str | None = None       # sparse backend; None = auto
    gnn_dtype: Any = jnp.float32         # GNN hot-path compute dtype
    gnn_mesh: Any = None                 # Mesh w/ model axis > 1: fused
                                         # kernels run edge-partitioned

    @nn.compact
    def __call__(self, sent_vecs: Array, graph: BatchedGraphs, *,
                 train: bool = False, return_pool_attn: bool = False,
                 return_gnn_attn: bool = False):
        """sent_vecs: (G, sent_dim); graph holds (G, N) node arrays + (G, E) edges.

        Returns logits (G, 1) [, pooler attention (n_head*G, N)]
        [, GNN attention ((k, G, E, H) edge alphas, (k, G, N, H) self alphas)].
        """
        # Context-node feature from the sentence vector (reference :153).
        gnn_input0 = gelu(nn.Dense(self.concept_dim,
                                   kernel_init=normal_init(self.init_std),
                                   name="svec2nvec")(sent_vecs))[:, None, :]
        # Entity features: frozen-table lookup + projection (reference :154).
        # Padding slots carry concept_id 1 -> table index 0, same as the
        # reference's pad convention (utils/data_utils.py:96).
        gnn_input1 = CustomizedEmbedding(
            concept_num=self.n_concept, concept_in_dim=self.concept_in_dim,
            concept_out_dim=self.concept_dim, init_std=self.init_std,
            name="concept_emb")(graph.concept_ids[:, 1:] - 1)
        gnn_input = jnp.concatenate([gnn_input0, gnn_input1], axis=1)
        gnn_input = nn.Dropout(self.p_emb, deterministic=not train)(gnn_input)

        node_mask = graph.node_mask  # (G, N) True == real node
        node_scores = normalize_node_scores(
            graph.node_scores, node_mask, graph.num_nodes)

        gnn_output = QAGNNMessagePassing(
            k=self.k, n_ntype=self.n_ntype, n_etype=self.n_etype,
            hidden_size=self.concept_dim, dropout=self.p_gnn,
            init_std=self.init_std, backend=self.gnn_backend,
            dtype=self.gnn_dtype, mesh=self.gnn_mesh, name="gnn")(
            gnn_input, graph.node_types, node_scores,
            graph.edge_src, graph.edge_dst, graph.edge_type, graph.edge_mask,
            train=train, return_alpha=return_gnn_attn)
        gnn_attn = None
        if return_gnn_attn:
            gnn_output, gnn_attn = gnn_output

        z_vecs = gnn_output[:, 0]  # context-node state (reference :172)

        # Pool over KG nodes only: mask out padding and the context node
        # (reference :174-177). True == masked OUT for the pooler.
        pool_mask = (~node_mask) | (graph.node_types == 3)
        # All-masked safety: unmask position 0 for degenerate rows.
        all_masked = jnp.all(pool_mask, axis=1)
        pool_mask = pool_mask.at[:, 0].set(
            jnp.where(all_masked, False, pool_mask[:, 0]))

        graph_vecs, pool_attn = MultiheadAttPoolLayer(
            n_head=self.n_attention_head, d_q_original=self.sent_dim,
            d_k_original=self.concept_dim, init_std=self.init_std,
            name="pooler")(sent_vecs, gnn_output, pool_mask,
                           deterministic=not train)

        concat = jnp.concatenate([graph_vecs, sent_vecs, z_vecs], axis=1)
        concat = nn.Dropout(self.p_fc, deterministic=not train)(concat)
        logits = MLP(input_size=self.concept_dim + self.sent_dim + self.concept_dim,
                     hidden_size=self.fc_dim, output_size=1,
                     num_layers=self.n_fc_layer, dropout=self.p_fc,
                     layer_norm=True, init_std=self.init_std,
                     name="fc")(concat, deterministic=not train)

        out = (logits,)
        if return_pool_attn:
            out = out + (pool_attn,)
        if return_gnn_attn:
            out = out + (gnn_attn,)
        return out if len(out) > 1 else logits


class LMQAGNN(nn.Module):
    """Encoder + decoder assembly (reference modeling/modeling_qagnn.py:192-251).

    `encoder` is any flax module mapping LM inputs -> pooled sentence vectors
    of width `sent_dim` (see qagnn_tpu.models.text_encoder). LM inputs arrive
    as (B, C, L) arrays and graphs as one BatchedGraphs with G == B*C; the
    choice-dim merge is a reshape (reference :220-224), not a data movement.
    """

    encoder: nn.Module
    sent_dim: int
    k: int
    n_ntype: int
    n_etype: int
    n_concept: int
    concept_dim: int
    concept_in_dim: int
    n_attention_head: int
    fc_dim: int
    n_fc_layer: int
    p_emb: float = 0.2
    p_gnn: float = 0.2
    p_fc: float = 0.2
    init_std: float = 0.02
    gnn_backend: str | None = None
    gnn_dtype: Any = jnp.float32
    gnn_mesh: Any = None

    @nn.compact
    def __call__(self, lm_inputs: dict[str, Array], graph: BatchedGraphs, *,
                 layer_id: int = -1, train: bool = False,
                 return_pool_attn: bool = False, detail: bool = False):
        """lm_inputs: dict of (B, C, L) arrays (input_ids, attention_mask, ...).

        Returns logits (B, C) [and pooler attention]. With detail=True
        (reference modeling/modeling_qagnn.py:236-241): (logits, pool_attn,
        gnn_attn) where gnn_attn = ((k, G, E, H) edge alphas, (k, G, N, H)
        self-loop alphas); the input graph already carries the concept_ids /
        node_types / edge tensors the reference echoes back.
        """
        first = next(iter(lm_inputs.values()))
        bs, nc = first.shape[0], first.shape[1]
        flat_lm = {k: v.reshape((bs * nc,) + v.shape[2:])
                   for k, v in lm_inputs.items()}

        sent_vecs = self.encoder(**flat_lm, layer_id=layer_id, train=train)
        if isinstance(sent_vecs, tuple):
            sent_vecs = sent_vecs[0]

        out = QAGNN(
            k=self.k, n_ntype=self.n_ntype, n_etype=self.n_etype,
            sent_dim=self.sent_dim, n_concept=self.n_concept,
            concept_dim=self.concept_dim, concept_in_dim=self.concept_in_dim,
            n_attention_head=self.n_attention_head, fc_dim=self.fc_dim,
            n_fc_layer=self.n_fc_layer, p_emb=self.p_emb, p_gnn=self.p_gnn,
            p_fc=self.p_fc, init_std=self.init_std,
            gnn_backend=self.gnn_backend, gnn_dtype=self.gnn_dtype,
            gnn_mesh=self.gnn_mesh, name="decoder")(
            sent_vecs, graph, train=train,
            return_pool_attn=return_pool_attn or detail,
            return_gnn_attn=detail)

        if detail:
            logits, pool_attn, gnn_attn = out
            return logits.reshape(bs, nc), pool_attn, gnn_attn
        if return_pool_attn:
            logits, pool_attn = out
            return logits.reshape(bs, nc), pool_attn
        return out.reshape(bs, nc)
