"""Explicit shard_map edge partitioning for the relational GAT core.

The GSPMD path (qagnn_tpu.parallel.graph_sharding) expresses edge
partitioning declaratively and lets XLA place the collectives. This module
is the EXPLICIT version — the halo-exchange structure of SURVEY §7 step 8
written out with shard_map + psum/pmax so the communication pattern is
visible, controllable, and benchmarkable:

  * edge arrays (G, E) are sharded along E across the `model` axis; each
    device owns E/P edges of every graph. Node arrays are replicated over
    `model` (sharded over `data` as usual), so all gathers are LOCAL.
  * cross-shard interaction is exactly three collectives per layer:
      1. pmax of the per-head score max          (G, 1, H)   — tiny
      2. psum of softmax denominators + degrees  (G, N, H+1) — the "halo"
      3. psum of the aggregated node features    (G, N, H*D)
    Everything else (SDDMM, exp, weighted SpMM partials) is local, and the
    message gather/weighting is independent of collective #2, so XLA
    overlaps the denominator exchange with local message work.

The reference has no distributed mode at all (its only multi-device feature
is the serial 2-GPU split, reference qagnn.py:132-140); this is the
TPU-native scaling story for the edge dimension — the graph analog of
sequence parallelism. The PRODUCTION-kernel version of the same structure
(the fused Pallas passes per shard, collectives between them) lives in
qagnn_tpu.parallel.edge_shard_pallas.

Semantics match qagnn_tpu.ops.gat_attention.relational_gat_attention_nodes
(reference modeling/modeling_qagnn.py:411-484) up to psum reassociation;
cross-checked (values and gradients) against the scatter oracle on a
virtual 8-device mesh in tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:                                  # jax >= 0.8
    from jax import shard_map
except ImportError:                   # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from qagnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array

_NEG = -1e30


@jax.custom_vjp
def _pmax_stopgrad(x):
    """pmax over the model axis, constant under differentiation (the softmax
    shift is stop-gradient in every backend; lax.pmax has no AD rule)."""
    return jax.lax.pmax(x, MODEL_AXIS)


def _pmax_fwd(x):
    return _pmax_stopgrad(x), None


def _pmax_bwd(_, g):
    return (jnp.zeros_like(g),)


_pmax_stopgrad.defvjp(_pmax_fwd, _pmax_bwd)


def edge_sharded_gat_nodes(
    node_query: Array,     # (G, N, H, D)
    node_key: Array,       # (G, N, H, D)
    node_msg: Array,       # (G, N, H, D)
    edge_key_bias: Array,  # (G, E, H, D)
    edge_msg_bias: Array,  # (G, E, H, D)
    self_key_bias: Array,  # (G, N, H, D)
    self_msg_bias: Array,  # (G, N, H, D)
    edge_src: Array,       # (G, E) int32
    edge_dst: Array,       # (G, E) int32
    edge_mask: Array,      # (G, E) bool
    *,
    mesh: Mesh,
):
    """Edge-partitioned forward of the relational GAT core.

    Graphs shard over `data`; the E axis shards over `model`. Returns
    (G, N, H*D) with the same sharding as the node inputs (data-sharded,
    model-replicated).
    """
    node4 = P(DATA_AXIS, None, None, None)
    edge4 = P(DATA_AXIS, MODEL_AXIS, None, None)
    edge2 = P(DATA_AXIS, MODEL_AXIS)
    out_spec = P(DATA_AXIS, None, None)

    fn = shard_map(
        _local_gat,
        mesh=mesh,
        in_specs=(node4, node4, node4, edge4, edge4, node4, node4,
                  edge2, edge2, edge2),
        out_specs=out_spec,
    )
    return fn(node_query, node_key, node_msg, edge_key_bias, edge_msg_bias,
              self_key_bias, self_msg_bias, edge_src, edge_dst, edge_mask)


def _local_gat(node_query, node_key, node_msg, edge_key_bias, edge_msg_bias,
               self_key_bias, self_msg_bias, edge_src, edge_dst, edge_mask):
    """Per-shard body: local edges, replicated nodes, 3 collectives."""
    G, El = edge_src.shape
    N = node_query.shape[1]
    H, D = node_query.shape[2], node_query.shape[3]
    f32 = jnp.float32
    cdt = node_query.dtype

    m = edge_mask.astype(cdt)[..., None]                       # (G, El, 1)
    oh_src = jax.nn.one_hot(edge_src, N, dtype=cdt) * m        # (G, El, N)
    oh_dst = jax.nn.one_hot(edge_dst, N, dtype=cdt) * m

    gather_src = functools.partial(jnp.einsum, "gen,gnhd->gehd", oh_src,
                                   preferred_element_type=cdt)
    gather_dst = functools.partial(jnp.einsum, "gen,gnhd->gehd", oh_dst,
                                   preferred_element_type=cdt)
    edge_query = gather_src(node_query)
    edge_key = gather_dst(node_key) + edge_key_bias.astype(cdt)
    edge_msg = gather_src(node_msg) + edge_msg_bias.astype(cdt)

    # local SDDMM + self-loop logits (self path identical on every shard)
    edge_scores = jnp.sum(edge_query.astype(f32) * edge_key.astype(f32),
                          axis=-1)                             # (G, El, H)
    self_scores = jnp.sum(
        node_query.astype(f32)
        * (node_key + self_key_bias).astype(f32), axis=-1)     # (G, N, H)

    # ---- collective 1: global per-head max over all edge shards ----------
    lmax = jnp.max(jnp.where(edge_mask[..., None], edge_scores, _NEG),
                   axis=1, keepdims=True)                      # (G, 1, H)
    gmax = _pmax_stopgrad(jax.lax.stop_gradient(lmax))
    gmax = jnp.maximum(gmax, jnp.max(self_scores, axis=1, keepdims=True))
    gmax = jax.lax.stop_gradient(gmax)

    e_edge = jnp.exp(edge_scores - gmax) * edge_mask[..., None].astype(f32)
    e_self = jnp.exp(self_scores - gmax)                       # (G, N, H)

    # ---- collective 2: psum of denominators + degrees ("halo" exchange) --
    # e_edge stays f32 here (the one-hot is cast UP instead): the psum'd
    # denominators then accumulate full-precision exponentials, matching the
    # fused Pallas kernel's f32 in-VMEM denominator accumulation rather than
    # the XLA onehot backend's bf16-rounded contraction.
    denom_l = jnp.einsum("gen,geh->gnh", oh_src.astype(f32), e_edge,
                         preferred_element_type=f32)
    deg_l = jnp.sum(oh_src, axis=1).astype(f32)[..., None]     # (G, N, 1)
    packed = jax.lax.psum(
        jnp.concatenate([denom_l, deg_l], axis=-1), MODEL_AXIS)
    denom = jnp.maximum(packed[..., :H] + e_self, 1e-16)       # (G, N, H)
    deg = packed[..., H:] + 1.0                                # (G, N, 1)

    scale_n = deg / denom                                      # (G, N, H)
    scale_e = jnp.einsum("gen,gnh->geh", oh_src, scale_n.astype(cdt),
                         preferred_element_type=f32)

    # local weighted SpMM partial (edge_msg was gathered before collective
    # 2 in data dependence, so XLA can overlap that work with the psum)
    weighted = (edge_msg.astype(f32)
                * (e_edge * scale_e)[..., None]).astype(cdt)
    aggr_l = jnp.einsum("gen,gehd->gnhd", oh_dst, weighted,
                        preferred_element_type=f32)

    # ---- collective 3: psum of aggregated features -----------------------
    aggr = jax.lax.psum(aggr_l, MODEL_AXIS)
    aggr = aggr + (node_msg + self_msg_bias).astype(f32) \
        * (e_self * scale_n)[..., None]
    return aggr.reshape(G, N, H * D)
