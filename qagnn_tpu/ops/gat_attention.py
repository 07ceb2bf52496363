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

All arrays are BATCHED per graph — (G, E, ...) edges with LOCAL node indices
in [0, N) — because the disjoint-union-with-global-offsets layout the
reference uses (modeling/modeling_qagnn.py:244-251) forces HLO scatter/gather
over a huge flat index space, which serializes on TPU.

Three backends, equivalent up to float reassociation:
  * "scatter": jax.ops.segment_sum / take over the flattened union. Fast on
    CPU, the correctness oracle everywhere (and the CPU default).
  * "onehot": every gather/scatter/segment-reduce becomes a per-graph
    (E, N) one-hot contraction — batched dot_generals that tile onto the
    MXU instead of serializing through HLO scatter (N <= a few hundred
    nodes per graph, as here: N = 200).
  * "pallas" (TPU default): the fused grid-tiled kernels of
    qagnn_tpu.ops.pallas_gat — same one-hot formulation but built in VMEM,
    never touching HBM; measured ~2x the onehot backend's train-step
    throughput on v5e at CSQA shapes (r4: 58.6M vs 29.5M edges/s, 0.70x
    of the roofline ceiling — see README "Roofline").
All three are cross-checked in tests (values and VJPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qagnn_tpu.ops.segment import (
    out_degree,
    segment_softmax_with_self_loops,
    segment_sum,
)

Array = jax.Array

_NEG = -1e30


def default_backend() -> str:
    """pallas on TPU: measured on v5e at CSQA bench shapes (r4), the fused
    grid-tiled kernels beat the XLA onehot path 58.6M vs 29.5M edges/s for
    the 5-layer train step. scatter elsewhere (exact, fast on CPU)."""
    return "pallas" if jax.default_backend() == "tpu" else "scatter"


def relational_gat_attention_nodes(
    node_query: Array,     # (G, N, H, D) — W_q x / sqrt(D), per node
    node_key: Array,       # (G, N, H, D) — A_k x (node part of the key)
    node_msg: Array,       # (G, N, H, D) — A_m x (node part of the message)
    edge_key_bias: Array,  # (G, E, H, D) — B_k e(edge)  (+ bias)
    edge_msg_bias: Array,  # (G, E, H, D) — B_m e(edge)  (+ bias)
    self_key_bias: Array,  # (G, N, H, D) — B_k e(self-loop)
    self_msg_bias: Array,  # (G, N, H, D) — B_m e(self-loop)
    edge_src: Array,       # (G, E) int32
    edge_dst: Array,       # (G, E) int32
    edge_mask: Array,      # (G, E) bool
    *,
    backend: str | None = None,
    return_alpha: bool = False,
):
    """Decomposed form: per-edge tensors are built INSIDE the op so the
    node->edge gathers can use the backend's fast path (one-hot contractions
    on TPU instead of HLO gather). Matches the linear-over-concat split of
    the reference's projections (modeling/modeling_qagnn.py:464-466):
        key(e)   = (A_k x)[dst_e] + B_k emb_e
        msg(e)   = (A_m x)[src_e] + B_m emb_e
        query(e) = (W_q x)[src_e]
    Self-loop rows use x itself on both sides with the self-loop embedding.
    """
    if backend is None:
        backend = default_backend()

    if backend == "pallas" and return_alpha:
        # The fused kernel never materializes per-edge alphas (that is the
        # point); analysis paths (eval_detail) fall back to the XLA onehot
        # backend, which matches the kernel up to fp reassociation.
        backend = "onehot"

    if backend == "pallas":
        from qagnn_tpu.ops.pallas_gat import (
            pad_edges_to_tile,
            pallas_relational_gat,
        )

        from qagnn_tpu.utils.tpu import lowering_platform

        G, N, H, D = node_query.shape
        flat = lambda t: t.reshape(t.shape[0], t.shape[1], H * D)
        interpret = lowering_platform() != "tpu"
        _, src_p, dst_p, mask_p, ekb_p, emb_p = pad_edges_to_tile(
            edge_src, edge_dst, edge_mask.astype(node_query.dtype),
            flat(edge_key_bias), flat(edge_msg_bias),
            dtype=node_query.dtype)
        return pallas_relational_gat(
            flat(node_query), flat(node_key), flat(node_msg),
            ekb_p, emb_p, flat(self_key_bias), flat(self_msg_bias),
            src_p, dst_p, mask_p, H, interpret).reshape(G, N, H * D)

    if backend == "onehot":
        G, E = edge_src.shape
        N = node_query.shape[1]
        cdt = node_query.dtype   # compute dtype (bf16 on TPU)
        m = edge_mask.astype(cdt)[..., None]
        oh_src = jax.nn.one_hot(edge_src, N, dtype=cdt) * m
        oh_dst = jax.nn.one_hot(edge_dst, N, dtype=cdt) * m
        gather_src = functools.partial(jnp.einsum, "gen,gnhd->gehd", oh_src,
                                       preferred_element_type=cdt)
        gather_dst = functools.partial(jnp.einsum, "gen,gnhd->gehd", oh_dst,
                                       preferred_element_type=cdt)
        edge_query = gather_src(node_query)
        edge_key = gather_dst(node_key) + edge_key_bias.astype(cdt)
        edge_msg = gather_src(node_msg) + edge_msg_bias.astype(cdt)
    else:
        def take(nodes, idx):
            return jnp.take_along_axis(
                nodes, idx[:, :, None, None], axis=1)
        edge_query = take(node_query, edge_src)
        edge_key = take(node_key, edge_dst) + edge_key_bias
        edge_msg = take(node_msg, edge_src) + edge_msg_bias

    self_query = node_query
    self_key = node_key + self_key_bias
    self_msg = node_msg + self_msg_bias

    return relational_gat_attention(
        edge_query, edge_key, edge_msg, edge_src, edge_dst, edge_mask,
        self_query, self_key, self_msg,
        backend=backend, return_alpha=return_alpha)


def relational_gat_attention(
    edge_query: Array,   # (G, E, H, D) — projected from the SOURCE node
    edge_key: Array,     # (G, E, H, D)
    edge_msg: Array,     # (G, E, H, D)
    edge_src: Array,     # (G, E) int32 local source index
    edge_dst: Array,     # (G, E) int32 local destination index
    edge_mask: Array,    # (G, E) bool — False for padding
    self_query: Array,   # (G, N, H, D) — self-loop path, one per node
    self_key: Array,     # (G, N, H, D)
    self_msg: Array,     # (G, N, H, D)
    *,
    backend: str | None = None,
    return_alpha: bool = False,
):
    """Returns aggregated node features (G, N, H*D); optionally alphas.

    `query` is expected pre-scaled by 1/sqrt(D) by the caller (mirroring
    reference modeling/modeling_qagnn.py:469).
    """
    if backend is None:
        backend = default_backend()
    if backend == "scatter":
        return _scatter_backend(edge_query, edge_key, edge_msg, edge_src,
                                edge_dst, edge_mask, self_query, self_key,
                                self_msg, return_alpha)
    if backend == "onehot":
        return _onehot_backend(edge_query, edge_key, edge_msg, edge_src,
                               edge_dst, edge_mask, self_query, self_key,
                               self_msg, return_alpha)
    raise ValueError(f"unknown backend {backend!r}")


# ---------------------------------------------------------------------------
# scatter backend (flattened union; correctness oracle)
# ---------------------------------------------------------------------------

def _scatter_backend(edge_query, edge_key, edge_msg, edge_src, edge_dst,
                     edge_mask, self_query, self_key, self_msg, return_alpha):
    G, E = edge_src.shape
    N = self_query.shape[1]
    H, D = edge_query.shape[2], edge_query.shape[3]

    offs = (jnp.arange(G, dtype=edge_src.dtype) * N)[:, None]
    src = (edge_src + offs).reshape(-1)
    dst = (edge_dst + offs).reshape(-1)
    mask = edge_mask.reshape(-1)
    eq = edge_query.reshape(G * E, H, D)
    ek = edge_key.reshape(G * E, H, D)
    em = edge_msg.reshape(G * E, H, D)
    sq = self_query.reshape(G * N, H, D)
    sk = self_key.reshape(G * N, H, D)
    sm = self_msg.reshape(G * N, H, D)

    edge_scores = jnp.sum(eq * ek, axis=-1)      # (GE, H)  SDDMM
    self_scores = jnp.sum(sq * sk, axis=-1)      # (GN, H)

    edge_alpha, self_alpha = segment_softmax_with_self_loops(
        edge_scores, src, mask, self_scores)

    deg = out_degree(src, G * N, mask, include_self_loop=True)
    edge_alpha_s = edge_alpha * deg[src][:, None]
    self_alpha_s = self_alpha * deg[:, None]

    weighted = em * edge_alpha_s[:, :, None]
    aggr = segment_sum(weighted, dst, G * N, mask)
    aggr = aggr + sm * self_alpha_s[:, :, None]

    out = aggr.reshape(G, N, H * D)
    if return_alpha:
        return out, (edge_alpha.reshape(G, E, H),
                     self_alpha.reshape(G, N, H))
    return out


# ---------------------------------------------------------------------------
# one-hot matmul backend (MXU path)
# ---------------------------------------------------------------------------

def _onehot_backend(edge_query, edge_key, edge_msg, edge_src, edge_dst,
                    edge_mask, self_query, self_key, self_msg, return_alpha):
    G, E = edge_src.shape
    N = self_query.shape[1]
    H, D = edge_query.shape[2], edge_query.shape[3]
    f32 = jnp.float32
    # Contractions run in the caller's compute dtype (bf16 on TPU for 4x MXU
    # throughput — one-hot operands are exact in bf16); accumulation and all
    # softmax arithmetic stay fp32 via preferred_element_type.
    cdt = edge_query.dtype

    edge_scores = jnp.sum(edge_query.astype(f32) * edge_key.astype(f32),
                          axis=-1)                           # (G, E, H)
    self_scores = jnp.sum(self_query.astype(f32) * self_key.astype(f32),
                          axis=-1)                           # (G, N, H)

    # --- segment max over src (edges ∪ self-loop), via masked broadcast ----
    # max_n[g,n,h] = max over {e: src=n} scores[g,e,h] ∪ self_scores[g,n,h].
    # A max can't ride a matmul; use the select form — (G, E, N, H) would be
    # huge, so compute per-node max with a where over the one-hot instead:
    # scores_exp (G, E, 1, H) vs oh_src (G, E, N) -> toolarge. Do it as a
    # scatter-free trick: sort-free N-pass is too slow; instead use the
    # standard bounded-logit shift: all scores are finite; subtract the
    # per-graph global max (a safe uniform shift) then exp without per-group
    # max. Softmax is shift-invariant per group under a GLOBAL shift too, and
    # exp(score - global_max) cannot overflow (<= 1). Underflow of tiny terms
    # only loses what fp32 would anyway round away after division.
    gmax = jnp.maximum(
        jnp.max(jnp.where(edge_mask[..., None], edge_scores, _NEG),
                axis=(1,), keepdims=True),                   # (G, 1, H)
        jnp.max(self_scores, axis=1, keepdims=True))
    gmax = jax.lax.stop_gradient(gmax)

    e_edge = jnp.exp(edge_scores - gmax) * edge_mask[..., None].astype(f32)
    e_self = jnp.exp(self_scores - gmax)                     # (G, N, H)

    # --- denominators + degree via one-hot contractions -------------------
    # (XLA's scatter lowers fine but COMPILES pathologically slowly on TPU
    # for these shapes; one-hot matmuls compile fast and run at the same
    # speed. In bf16 compute the exp terms round to ~3 decimal digits before
    # the fp32 accumulation — a ~0.4% perturbation of attention weights; the
    # fp32/scatter path remains the exact parity oracle.)
    oh_src = (jax.nn.one_hot(edge_src, N, dtype=cdt)
              * edge_mask.astype(cdt)[..., None])            # (G, E, N)
    denom = jnp.einsum("gen,geh->gnh", oh_src, e_edge.astype(cdt),
                       preferred_element_type=f32) + e_self
    # Guard against a group so far below the global max that every term
    # underflows (needs a score spread > ~87; the scatter backend's per-group
    # max never degenerates, so the two paths only differ in that regime).
    denom = jnp.maximum(denom, 1e-16)
    deg = jnp.sum(oh_src, axis=1).astype(f32) + 1.0          # (G, N)

    # --- alpha (with degree rescale), gathered back per edge --------------
    scale_n = deg[..., None] / denom                         # (G, N, H)
    scale_e = jnp.einsum("gen,gnh->geh", oh_src, scale_n.astype(cdt),
                         preferred_element_type=f32)
    edge_alpha_s = e_edge * scale_e                          # (G, E, H)
    self_alpha_s = e_self * scale_n

    # --- SpMM: aggregate weighted messages at dst via a one-hot contraction
    # (tiles onto the MXU; fp32 accumulation via preferred_element_type) ----
    weighted = (edge_msg.astype(f32)
                * edge_alpha_s[..., None]).astype(cdt)       # (G, E, H, D)
    oh_dst = (jax.nn.one_hot(edge_dst, N, dtype=cdt)
              * edge_mask.astype(cdt)[..., None])            # (G, E, N)
    aggr = jnp.einsum("gen,gehd->gnhd", oh_dst, weighted,
                      preferred_element_type=f32)
    aggr = aggr + self_msg.astype(f32) * self_alpha_s[..., None]

    out = aggr.reshape(G, N, H * D)
    if return_alpha:
        denom_e = jnp.einsum("gen,gnh->geh", oh_src, denom.astype(cdt),
                             preferred_element_type=f32)
        edge_alpha = jnp.where(edge_mask[..., None],
                               e_edge / denom_e, 0.0)
        self_alpha = e_self / denom
        return out, (edge_alpha, self_alpha)
    return out
