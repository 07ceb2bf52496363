"""Relation-aware GNN: GATConvE layer + k-layer message-passing module.

TPU-native re-design of the reference's GNN core (reference
modeling/modeling_qagnn.py:7-95 QAGNN_Message_Passing and :380-484 GATConvE).
Same math, different execution strategy:

  * Fixed shapes everywhere — edges are padded (G, E) arrays with masks
    (see qagnn_tpu.graph.container.BatchedGraphs); no dynamic edge counts.
  * Self-loops are never materialized as edges; they run as a dense (N,) path
    joined analytically in the segment softmax
    (qagnn_tpu.ops.segment.segment_softmax_with_self_loops).
  * The shared edge encoder's inputs (relation one-hot + head/tail type
    one-hots) are IDENTICAL for every one of the k layers, so edge embeddings
    are computed once and reused — the reference recomputes them k times
    (reference modeling/modeling_qagnn.py:433 inside each layer's forward).
    BatchNorm running stats stay faithful via MaskedBatchNorm(num_updates=k).
  * The per-edge projections linear_key([x_i ‖ e]) / linear_msg([x_j ‖ e]) /
    linear_query(x_j) (reference modeling/modeling_qagnn.py:464-466) are
    decomposed into node-level GEMMs (N rows) gathered per edge plus an
    edge-level GEMM on the edge embedding (E rows). Linear-over-concat equals
    the sum of linears, so results are bit-identical in exact arithmetic, and
    the x-dependent 2/3 of the FLOPs shrink by E/N ≈ 30x.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from qagnn_tpu.models.layers import gelu, normal_init
from qagnn_tpu.models.norm import MaskedBatchNorm
from qagnn_tpu.ops.gat_attention import (
    default_backend,
    relational_gat_attention_nodes,
)
from qagnn_tpu.parallel.mesh import MODEL_AXIS

Array = jax.Array


class _ProjParams(nn.Module):
    """Bare Dense-shaped parameters (kernel + bias, same tree as nn.Dense)
    for projections that execute INSIDE the fused Pallas kernel instead of
    as an XLA GEMM. Keeps checkpoints interchangeable across backends."""

    in_dim: int
    out_dim: int
    init_std: float
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", normal_init(self.init_std),
                       (self.in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,)) \
            if self.use_bias else None
        return k, b


class EdgeEncoder(nn.Module):
    """Shared edge-feature MLP: Linear -> BatchNorm -> ReLU -> Linear.

    Matches reference modeling/modeling_qagnn.py:30. Input rows are
    [one_hot(edge_type, n_etype+1) ‖ one_hot(head_type,4) ‖ one_hot(tail_type,4)]
    for real edges and the self-loop variant (relation index n_etype) for nodes.
    BatchNorm statistics are taken over the union of masked edge rows and ALL
    node self-loop rows — exactly the row population the reference's dynamic
    edge list (reference modeling/modeling_qagnn.py:431-433) would produce.
    """

    hidden_size: int
    num_updates: int = 1  # k, for running-stat parity with k reference calls
    init_std: float = 0.02
    dtype: jnp.dtype = jnp.float32   # compute dtype (bf16 on the TPU hot
                                     # path; BN stats stay f32 internally)
    mesh: Any = None   # device mesh: the edge_ints kernels run shard_mapped
                       # (parallel/edge_shard_pallas encoder wrappers)

    @nn.compact
    def __call__(self, edge_feat, weight=None, *, train: bool,
                 return_hidden: bool = False, edge_ints: tuple | None = None,
                 n_rel: int | None = None, n_ntype: int | None = None):
        """edge_feat: (rows, F) with stat weight, OR a list of
        (rows_i, F)/weight_i parts sharing ONE BatchNorm statistic — the
        edge rows and self-loop rows are one population in the reference
        but concatenating them just to slice the output back costs two
        row-array copies (see MaskedBatchNorm multi-part mode).

        return_hidden: return (hidden_parts, (W1, b1)) with linear_1 NOT
        applied — the fused pallas path composes W1 into its in-kernel
        key_e/msg_e projections (linear is associative), so linear_1's
        (rows, D) output and its big fwd/bwd GEMMs never exist; only tiny
        (D, D) weight-composition GEMMs remain. linear_1's parameters keep
        the nn.Dense tree (checkpoints stay backend-interchangeable).

        edge_ints = (edge_type, edge_src, edge_dst, node_type, edge_mask)
        — the FULLY FUSED edge side (pallas path): edge_feat is then only
        the self-loop rows; head/tail types are gathered in-kernel (an
        XLA take_along_axis gather of node_type[src] cost ~2.7 ms/step in
        the driver program). The edge rows' linear_0 + BN + ReLU run in the
        qagnn_tpu.ops.pallas_edge_encoder kernels, emitting h TRANSPOSED
        (G, D, E_pad); the BN batch moments of the edge rows are ANALYTIC
        in (W0, b0) given the masked feature histogram/second moment, so
        the BN-train gradient paths stay ordinary JAX autodiff. Implies
        return_hidden. Returns ((h_edge_t, h_self_rows), (W1, b1))."""
        lin0_params = None
        if edge_ints is not None:
            lin0_params = _ProjParams(n_rel + 2 * n_ntype, self.hidden_size,
                                      self.init_std, name="linear_0")()
        else:
            lin0 = nn.Dense(self.hidden_size,
                            kernel_init=normal_init(self.init_std),
                            dtype=self.dtype, name="linear_0")
        k1, b1 = _ProjParams(self.hidden_size, self.hidden_size,
                             self.init_std, name="linear_1")()
        bn = MaskedBatchNorm(features=self.hidden_size,
                             num_updates=self.num_updates, name="bn")
        cdt = self.dtype

        if edge_ints is not None:
            assert return_hidden
            from qagnn_tpu.models.norm import MomentPart
            from qagnn_tpu.ops.pallas_edge_encoder import (
                analytic_edge_moments,
                edge_feature_moments,
                edge_hidden,
            )
            from qagnn_tpu.utils.tpu import lowering_platform

            etype, esrc, edst, ntype, emask = edge_ints
            w0, b0 = lin0_params
            x0_self = jnp.dot(edge_feat.astype(cdt), w0.astype(cdt)) \
                + b0.astype(cdt)
            interp = lowering_platform() != "tpu"
            if self.mesh is not None:
                # shard_map forms of the SAME kernels — edges split over
                # (data, model); the caller pre-pads E to whole per-shard
                # tiles (GSPMD can't partition the Mosaic calls directly)
                from qagnn_tpu.parallel.edge_shard_pallas import (
                    edge_feature_moments_sharded, edge_hidden_sharded)
                moments_fn = functools.partial(
                    edge_feature_moments_sharded, mesh=self.mesh,
                    interpret=interp)
                hidden_fn = lambda a, b: edge_hidden_sharded(
                    etype, esrc, edst, ntype, w0, b0, a, b,
                    n_rel, n_ntype, cdt, self.mesh, interp)
            else:
                moments_fn = functools.partial(edge_feature_moments,
                                               interpret=interp)
                hidden_fn = lambda a, b: edge_hidden(
                    etype, esrc, edst, ntype, w0, b0, a, b,
                    n_rel, n_ntype, cdt, interp)
            if train:
                hist, M, n_e = moments_fn(
                    etype, esrc, edst, ntype, emask, n_rel, n_ntype)
                s1, s2 = analytic_edge_moments(w0, b0, hist, M, n_e)
                res, (a, b) = bn([MomentPart(s1, s2, n_e),
                                  (x0_self, None)],
                                 use_running_average=False,
                                 return_affine=True)
                h_self = jax.nn.relu(res[1])
            else:
                res, (a, b) = bn([(x0_self, None)],
                                 use_running_average=True,
                                 return_affine=True)
                h_self = jax.nn.relu(res[0])
            h_edge_t = hidden_fn(a, b)
            return (h_edge_t, h_self), (k1, b1)

        multi = isinstance(edge_feat, (tuple, list))
        parts = list(edge_feat) if multi else [(edge_feat, weight)]
        hs = bn([(lin0(f), w) for f, w in parts],
                use_running_average=not train)
        hs = [jax.nn.relu(h) for h in hs]
        if return_hidden:
            return (hs if multi else hs[0]), (k1, b1)
        outs = [jnp.dot(h.astype(cdt), k1.astype(cdt)) + b1.astype(cdt)
                for h in hs]
        return outs if multi else outs[0]


class GATConvE(nn.Module):
    """One relation-aware multi-head edge-attention layer.

    Exact math of reference modeling/modeling_qagnn.py:380-484 (see
    qagnn_tpu.ops.gat_attention for the attention semantics). Inputs are
    batched per graph: node features (G, N, 2*emb_dim) plus precomputed
    edge/self-loop embeddings.
    """

    emb_dim: int
    head_count: int = 4  # hard default in reference modeling/modeling_qagnn.py:387
    init_std: float = 0.02
    backend: str | None = None
    dtype: jnp.dtype = jnp.float32   # compute dtype for projections/contractions
    mesh: Any = None     # jax.sharding.Mesh with a 'model' axis > 1: run the
                         # fused kernels edge-partitioned via shard_map
                         # (GSPMD cannot partition a Mosaic custom call) —
                         # parallel/edge_shard_pallas. pallas backend only.

    @nn.compact
    def __call__(
        self,
        x: Array,                 # (G, N, 2*emb_dim) — [node feats ‖ extra feats]
        edge_src: Array,          # (G, E) int32 local source indices
        edge_dst: Array,          # (G, E) int32 local destination indices
        edge_mask: Array,         # (G, E) bool
        edge_emb: Array,          # (G, E, emb_dim) — from the shared EdgeEncoder
        self_emb: Array,          # (G, N, emb_dim) — self-loop edge embeddings
        *,
        train: bool,
        return_alpha: bool = False,
        chain_in: tuple | None = None,   # (emb_p, src_p, dst_p, mask_p) from
                                         # the previous layer's passthrough
        chain_out: bool = False,         # also return that tuple for the
                                         # next layer (pallas path only)
        emb_proj: tuple | None = None,   # (W1, b1) of the edge encoder's
                                         # linear_1 when edge_emb/self_emb
                                         # are PRE-linear_1 hidden states:
                                         # composed into key_e/msg_e so the
                                         # (rows, D) linear_1 output never
                                         # materializes (pallas path only)
        emb_transposed: bool = False,    # edge_emb already rides (G, D, E)
    ):
        d, h = self.emb_dim, self.head_count
        assert d % h == 0
        dph = d // h
        split = isinstance(x, tuple)   # (X, node_extra) not yet concatenated
        G, N = (x[0] if split else x).shape[:2]

        # Decomposed projections (reference modeling/modeling_qagnn.py:464-466):
        #   key   = W_k [x_i ‖ e]  =  (A_k x)_i + B_k e
        #   msg   = W_m [x_j ‖ e]  =  (A_m x)_j + B_m e
        #   query = W_q x_j / sqrt(dph)
        # Node-side GEMMs run over N rows; only the edge-embedding side runs
        # over E rows. The bias lives on the edge side so it's added once.
        # With x = (X, node_extra) the concat is split through the kernels
        # (linear-over-concat = sum of linears): the (G, N, 2D) array never
        # materializes, at identical param trees (key_x/{kernel} etc.).
        cdt0 = self.dtype
        if split:
            Xb, extra = x
            din = Xb.shape[-1] + extra.shape[-1]
            half_x = Xb.shape[-1]
            wqx, bqx = _ProjParams(din, d, self.init_std, name="query")()
            wkx, _ = _ProjParams(din, d, self.init_std, use_bias=False,
                                 name="key_x")()
            wmx, _ = _ProjParams(din, d, self.init_std, use_bias=False,
                                 name="msg_x")()

            # one (.., D) x (D, 3D) GEMM per input half instead of six
            # narrow ones: the 3D=600-wide output pads 600->640 lanes
            # (1.07x) where each 200-wide GEMM pads 200->256 (1.28x), and
            # four dispatches disappear
            wcat = jnp.concatenate([wqx, wkx, wmx], axis=1)   # (2D, 3D)
            out3 = jnp.dot(Xb.astype(cdt0), wcat[:half_x].astype(cdt0)) \
                + jnp.dot(extra.astype(cdt0), wcat[half_x:].astype(cdt0))
            query_x = out3[..., :d] + bqx.astype(cdt0)
            key_x = out3[..., d:2 * d]
            msg_x = out3[..., 2 * d:]
        else:
            key_x_d = nn.Dense(d, use_bias=False, dtype=self.dtype,
                               kernel_init=normal_init(self.init_std),
                               name="key_x")
            msg_x_d = nn.Dense(d, use_bias=False, dtype=self.dtype,
                               kernel_init=normal_init(self.init_std),
                               name="msg_x")
            query_d = nn.Dense(d, dtype=self.dtype,
                               kernel_init=normal_init(self.init_std),
                               name="query")
            query_x, key_x, msg_x = query_d(x), key_x_d(x), msg_x_d(x)

        backend = self.backend or default_backend()
        assert not (chain_out or chain_in is not None
                    or emb_proj is not None) \
            or (backend == "pallas" and not return_alpha), \
            "edge-emb chaining/composition only exists on the fused " \
            "pallas path"
        # ANY mesh routes the fused kernels through shard_map: GSPMD
        # cannot partition a Mosaic custom call, so even a pure
        # data-parallel mesh would otherwise ALL-GATHER the full batch to
        # every device and run it replicated (measured by
        # tools/collective_audit.py: 875 MB/step of gathers on a 2x1
        # mesh). The shard_map form splits graphs over `data` and edges
        # over `model`; with model == 1 its cross-shard collectives are
        # no-ops.
        sharded = self.mesh is not None and backend == "pallas"
        n_shards = self.mesh.shape.get(MODEL_AXIS, 1) if sharded else 1
        assert not sharded or (chain_in is None and not chain_out), \
            "cross-layer edge-emb chaining is single-device only (the " \
            "sharded op has no passthrough variant)"
        if backend == "pallas" and not return_alpha:
            # Fused path: the key_e/msg_e projections run INSIDE the Pallas
            # kernels per edge tile (qagnn_tpu.ops.pallas_gat projected
            # variant) — edge_emb is read once per pass instead of two
            # (E, HD) bias arrays + their cotangents round-tripping HBM.
            # Param tree matches the Dense path exactly (key_e/{kernel,bias}).
            from qagnn_tpu.ops.pallas_gat import (
                pad_edges_to_tile,
                pallas_relational_gat_projected,
                pallas_relational_gat_projected_chained,
            )

            e_in = edge_emb.shape[1] if emb_transposed \
                else edge_emb.shape[-1]
            wke, bke = _ProjParams(e_in, d, self.init_std, name="key_e")()
            wme, bme = _ProjParams(e_in, d, self.init_std, name="msg_e")()
            cdt = self.dtype
            if emb_proj is not None:
                # linear-over-linear composition: edge_emb = h W1 + b1, so
                # key_e(edge_emb) = h (W1 Wke) + (b1 Wke + bke). The f32
                # compositions are (D, D) GEMMs — JAX routes dW1/db1 back
                # through them, summed across the k layers' uses.
                w1, b1 = emb_proj
                wke, bke = jnp.dot(w1, wke), jnp.dot(b1, wke) + bke
                wme, bme = jnp.dot(w1, wme), jnp.dot(b1, wme) + bme

            def proj(t, w, b):   # nn.Dense semantics: compute in cdt
                return jnp.dot(t.astype(cdt), w.astype(cdt)) + b.astype(cdt)

            nq = query_x / math.sqrt(dph)               # (G, N, d)
            if chain_in is not None:
                # the previous layer's passthrough: identical values, padded
                # once; routing edge_emb's cotangent through the chain
                # instead of an add_any over k layers (see the chained op).
                emb_p, src_p, dst_p, mask_p = chain_in
            else:
                # the fused op takes the edge embedding TRANSPOSED (G, D, E)
                # — the layout the kernels consume natively (and the fused
                # edge-encoder kernel produces natively). Under edge
                # partitioning the padded E must also split evenly into
                # n_shards whole-tile slices.
                t_e, src_p, dst_p, mask_p = pad_edges_to_tile(
                    edge_src, edge_dst, edge_mask.astype(nq.dtype),
                    dtype=nq.dtype, shards=n_shards)
                emb_p = edge_emb.astype(cdt) if emb_transposed \
                    else jnp.swapaxes(edge_emb.astype(cdt), 1, 2)
                E_pad = src_p.shape[1]
                if E_pad != emb_p.shape[2]:
                    emb_p = jnp.pad(
                        emb_p, ((0, 0), (0, 0), (0, E_pad - emb_p.shape[2])))
            from qagnn_tpu.utils.tpu import lowering_platform
            interp = lowering_platform() != "tpu"
            args = (nq, key_x, msg_x, emb_p,
                    wke, bke, wme, bme,
                    proj(self_emb, wke, bke), proj(self_emb, wme, bme),
                    src_p, dst_p, mask_p)
            if sharded:
                # production kernels on a (data, model) mesh: graphs split
                # over `data`, each model-axis device runs the fused
                # passes on its E/n_shards edge slice; 5 collectives knit
                # the edge shards (see parallel/edge_shard_pallas). This
                # is what the driver runs on any mesh — replaces the
                # reference's only multi-device mode (reference
                # qagnn.py:132-140).
                from qagnn_tpu.parallel.edge_shard_pallas import (
                    pallas_edge_sharded_projected)
                aggr = pallas_edge_sharded_projected(
                    *args, h, self.mesh, interp)
            elif chain_out:
                aggr, emb_pass = pallas_relational_gat_projected_chained(
                    *args, h, interp)
                chain_next = (emb_pass, src_p, dst_p, mask_p)
            else:
                aggr = pallas_relational_gat_projected(*args, h, interp)
        else:
            key_e_d = nn.Dense(d, dtype=self.dtype,
                               kernel_init=normal_init(self.init_std),
                               name="key_e")
            msg_e_d = nn.Dense(d, dtype=self.dtype,
                               kernel_init=normal_init(self.init_std),
                               name="msg_e")

            def heads(t):
                return t.reshape(t.shape[:-1] + (h, dph))

            node_key = heads(key_x)                     # (G, N, H, dph)
            node_msg = heads(msg_x)
            node_query = heads(query_x / math.sqrt(dph))

            edge_key_bias = heads(key_e_d(edge_emb))    # (G, E, H, dph)
            edge_msg_bias = heads(msg_e_d(edge_emb))
            # Self-loop rows use the SAME projections applied to the
            # self-loop edge embedding (reference appends one self-loop per
            # node, :436-438).
            self_key_bias = heads(key_e_d(self_emb))    # (G, N, H, dph)
            self_msg_bias = heads(msg_e_d(self_emb))

            aggr = relational_gat_attention_nodes(
                node_query, node_key, node_msg,
                edge_key_bias, edge_msg_bias, self_key_bias, self_msg_bias,
                edge_src, edge_dst, edge_mask,
                backend=backend, return_alpha=return_alpha,
            )
            if return_alpha:
                aggr, alphas = aggr

        # Output MLP: Linear -> BN -> ReLU -> Linear
        # (reference modeling/modeling_qagnn.py:408,443). The reference's BN
        # sees ALL node rows including padded nodes, so no stat mask here.
        # Runs in the GNN compute dtype (bf16 on TPU, the reference's amp
        # class); BN statistics stay f32 inside MaskedBatchNorm.
        out = nn.Dense(d, kernel_init=normal_init(self.init_std),
                       dtype=self.dtype, name="out_linear_0")(aggr)
        out = MaskedBatchNorm(features=d, name="out_bn")(
            out.reshape(G * N, d), None,
            use_running_average=not train).reshape(G, N, d)
        out = jax.nn.relu(out)
        out = nn.Dense(d, kernel_init=normal_init(self.init_std),
                       dtype=self.dtype, name="out_linear_1")(out)

        if return_alpha:
            return out, alphas
        if chain_out:
            return out, chain_next
        return out


class QAGNNMessagePassing(nn.Module):
    """k-layer message passing with node-type/score feature injection.

    Matches reference modeling/modeling_qagnn.py:7-95 (QAGNN_Message_Passing):
    node-type one-hot embedding, sinusoidal score-basis embedding (basis
    1.1^j), k GATConvE layers with GELU+dropout, residual combine
    GELU(Vh(H) + Vx(X)) with dropout.
    """

    k: int
    n_ntype: int
    n_etype: int
    hidden_size: int
    dropout: float = 0.1
    head_count: int = 4
    init_std: float = 0.02
    backend: str | None = None   # sparse-op backend; None = auto per platform
    dtype: jnp.dtype = jnp.float32   # compute dtype for the GNN hot path
    mesh: Any = None   # Mesh with model axis > 1: pallas layers run
                       # edge-partitioned (parallel/edge_shard_pallas)

    @nn.compact
    def __call__(
        self,
        H: Array,            # (G, N, D) initial node features
        node_type: Array,    # (G, N) int
        node_score: Array,   # (G, N) float — normalized LM relevance
        edge_src: Array,     # (G, E) local indices
        edge_dst: Array,     # (G, E)
        edge_type: Array,    # (G, E)
        edge_mask: Array,    # (G, E) bool
        *,
        train: bool,
        return_alpha: bool = False,
    ):
        G, N, D = H.shape
        assert D == self.hidden_size
        half = D // 2

        # --- node-type embedding (reference :65-66) ----------------------
        T = jax.nn.one_hot(node_type, self.n_ntype, dtype=H.dtype)
        type_emb = gelu(nn.Dense(half, kernel_init=normal_init(self.init_std),
                                 dtype=self.dtype,
                                 name="emb_node_type")(T))       # (G, N, D/2)

        # --- sinusoidal score embedding (reference :69-73, basis 1.1^j) --
        js = jnp.power(1.1, jnp.arange(half, dtype=H.dtype))     # (D/2,)
        B = jnp.sin(js[None, None, :] * node_score[:, :, None])  # (G, N, D/2)
        score_emb = gelu(nn.Dense(half, kernel_init=normal_init(self.init_std),
                                  dtype=self.dtype,
                                  name="emb_score")(B))          # (G, N, D/2)

        node_extra = jnp.concatenate([type_emb, score_emb], axis=-1)  # (G, N, D)

        # --- edge embeddings, computed ONCE for all k layers -------------
        # Features: [one_hot(rel, n_etype+1) ‖ one_hot(head_t,4) ‖ one_hot(tail_t,4)]
        # (reference :419-433); self-loops use relation index n_etype and
        # head==tail==own type (reference :420-421,428-429).
        fdt = self.dtype
        E = edge_src.shape[1]

        s_rel = jnp.zeros((G, N, self.n_etype + 1), fdt) \
            .at[:, :, self.n_etype].set(1.0)
        s_type = jax.nn.one_hot(node_type, self.n_ntype, dtype=fdt)
        self_feat = jnp.concatenate([s_rel, s_type, s_type], axis=-1)
        nfeat = self_feat.shape[-1]

        # One BN statistic over the union of (masked) edge rows and all
        # self-loop rows, exactly the reference's E+N-row batch (reference
        # :431-433). k EMA updates are folded into one call (num_updates=k).
        # Fused pallas path: the edge rows' one-hot features never
        # materialize — linear_0+BN+ReLU run in the pallas edge-encoder
        # kernels (analytic BN moments), h comes back TRANSPOSED (G, D,
        # E_pad), and linear_1 is composed into the GAT kernels' key_e /
        # msg_e projections (emb_proj).
        use_fused = ((self.backend or default_backend()) == "pallas"
                     and not return_alpha)
        # any mesh -> encoder kernels AND GAT layers run via shard_map
        # (GSPMD cannot partition Mosaic calls; see GATConvE /
        # tools/collective_audit.py rationale)
        sharded = self.mesh is not None and use_fused
        enc = EdgeEncoder(hidden_size=D, num_updates=self.k,
                          init_std=self.init_std, dtype=self.dtype,
                          mesh=self.mesh if sharded else None,
                          name="edge_encoder")
        emb_proj = None
        if use_fused:
            if sharded:
                # pre-pad E once so every model shard is a whole number
                # of kernel tiles — the encoder AND GAT shard_maps then
                # agree on the split; GATConvE's own pad becomes a no-op
                from qagnn_tpu.ops.pallas_gat import pad_edges_to_tile
                n_model = self.mesh.shape.get(MODEL_AXIS, 1)
                _, edge_src, edge_dst, edge_mask, edge_type = \
                    pad_edges_to_tile(
                        edge_src, edge_dst, edge_mask.astype(self.dtype),
                        edge_type, dtype=self.dtype, shards=n_model)
            (edge_emb, self_emb), emb_proj = enc(
                self_feat.reshape(G * N, nfeat), train=train,
                return_hidden=True,
                edge_ints=(edge_type, edge_src, edge_dst, node_type,
                           edge_mask),
                n_rel=self.n_etype + 1, n_ntype=self.n_ntype)
            # edge_emb: (G, D, E_pad) transposed hidden states
            self_emb = self_emb.reshape(G, N, D)
        else:
            # One-hot features are exact in any float dtype — build them
            # directly in the compute dtype so the (G*E, 47) block never
            # materializes at f32 on the bf16 hot path.
            e_rel = jax.nn.one_hot(edge_type, self.n_etype + 1, dtype=fdt)
            head_t = jnp.take_along_axis(node_type, edge_src, axis=1)
            tail_t = jnp.take_along_axis(node_type, edge_dst, axis=1)
            e_head = jax.nn.one_hot(head_t, self.n_ntype, dtype=fdt)
            e_tail = jax.nn.one_hot(tail_t, self.n_ntype, dtype=fdt)
            edge_feat = jnp.concatenate([e_rel, e_head, e_tail], axis=-1)
            edge_emb, self_emb = enc(
                [(edge_feat.reshape(G * E, nfeat),
                  edge_mask.reshape(-1).astype(H.dtype)),
                 (self_feat.reshape(G * N, nfeat), None)], train=train)
            edge_emb = edge_emb.reshape(G, E, D)
            self_emb = self_emb.reshape(G, N, D)

        # --- k GNN layers (reference mp_helper :45-50) --------------------
        # With return_alpha, every layer also yields its per-edge/self-loop
        # attention weights — the analog of the reference's per-conv
        # `self._alpha` stash (reference modeling/modeling_qagnn.py:445-450).
        X = H
        alphas = []
        # Chain the padded edge embedding through the pallas layers so its
        # cotangent accumulates inside the fused backward kernels instead of
        # as a k-way XLA add of (G, E, D) arrays (see
        # pallas_relational_gat_projected_chained).
        chain = None
        for i in range(self.k):
            chain_out = use_fused and not sharded and i < self.k - 1
            # fused path: hand (X, node_extra) unconcatenated — the layer
            # splits its projections over the two halves, so the
            # (G, N, 2D) concat (and its cotangent slice) never exists
            xin = (X, node_extra) if use_fused \
                else jnp.concatenate([X, node_extra], axis=2)
            X = GATConvE(emb_dim=D, head_count=self.head_count,
                         init_std=self.init_std, backend=self.backend,
                         dtype=self.dtype, mesh=self.mesh,
                         name=f"gnn_layer_{i}")(
                xin,
                edge_src, edge_dst, edge_mask, edge_emb, self_emb,
                train=train, return_alpha=return_alpha,
                chain_in=chain, chain_out=chain_out, emb_proj=emb_proj,
                emb_transposed=use_fused)
            if return_alpha:
                X, layer_alphas = X
                alphas.append(layer_alphas)
            elif chain_out:
                X, chain = X
            X = gelu(X)
            X = nn.Dropout(self.dropout, deterministic=not train)(X)

        # --- residual combine (reference :92-93) --------------------------
        out = gelu(
            nn.Dense(D, kernel_init=normal_init(self.init_std),
                     dtype=self.dtype, name="Vh")(H)
            + nn.Dense(D, kernel_init=normal_init(self.init_std),
                       dtype=self.dtype, name="Vx")(X))
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if return_alpha:
            # (k, G, E, H) edge alphas and (k, G, N, H) self-loop alphas
            edge_a = jnp.stack([a[0] for a in alphas])
            self_a = jnp.stack([a[1] for a in alphas])
            return out, (edge_a, self_a)
        return out
