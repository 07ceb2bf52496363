"""Cross-FRAMEWORK parity: a faithful plain-torch implementation of the
reference's message-passing math versus qagnn_tpu's flax module.

The numpy oracle in test_gnn.py and the JAX implementation share an
author; this oracle is an INDEPENDENT third implementation written
directly from the reference source (reference
modeling/modeling_qagnn.py:7-95 QAGNN_Message_Passing and :380-484
GATConvE) in core torch — dynamic edge lists, appended self-loop edges,
train-mode torch.nn.BatchNorm1d over the E+N row union, src-grouped
segment softmax, out-degree rescale — with the SAME weights exported
from the flax param tree. It exercises exactly the reference's
formulation (no PyG needed: propagate/softmax/scatter replaced by core
index_add / scatter_reduce), so it checks the semantics our fixed-shape
masked re-design claims to reproduce:

  * analytic self-loops == appended self-loop edges,
  * masked-BN statistics == dynamic-row BatchNorm1d,
  * decomposed projections == concat projections,
  * padded edges with masks == variable-length edge lists.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from qagnn_tpu.models.gnn import QAGNNMessagePassing

N_NTYPE, N_ETYPE, K, D, HEADS = 4, 7, 2, 16, 4


def _gelu(x):
    # reference GELU (tanh approximation, reference utils/layers.py:17-22)
    return 0.5 * x * (1.0 + torch.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * torch.pow(x, 3.0))))


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _linear(x, kernel, bias=None):
    """flax Dense semantics: y = x @ kernel + bias."""
    y = x @ _t(kernel)
    return y if bias is None else y + _t(bias)


def _bn_train(x, scale, bias, eps=1e-5):
    """torch BatchNorm1d train-mode normalize (biased batch variance,
    reference edge_encoder / conv MLP BN, modeling_qagnn.py:30,408)."""
    mean = x.mean(0)
    var = x.var(0, unbiased=False)
    return (x - mean) / torch.sqrt(var + eps) * _t(scale) + _t(bias)


def _segment_softmax_by_src(scores, src, n_nodes):
    """torch_geometric.utils.softmax semantics: per-(src, head) groups
    with a per-group max shift (reference modeling_qagnn.py:471-472)."""
    m = torch.full((n_nodes, scores.shape[1]), -1e30)
    m = m.scatter_reduce(0, src[:, None].expand_as(scores), scores,
                         "amax", include_self=True)
    e = torch.exp(scores - m[src])
    denom = torch.zeros_like(m).index_add_(0, src, e)
    return e / denom[src]


def torch_reference_mp(params, batch_stats, H, node_type, node_score,
                       edge_index, edge_type):
    """QAGNN_Message_Passing.forward (reference modeling_qagnn.py:53-95)
    + k x GATConvE (reference :411-484), train mode, dropout 0. H is
    (B, N, D); edge_index/edge_type are the DYNAMIC batched edge lists
    (global node ids), as the reference's batch_graph produces."""
    B, N, dim = H.shape
    half = dim // 2
    p = params

    T = torch.nn.functional.one_hot(
        torch.tensor(np.asarray(node_type).reshape(-1)), N_NTYPE).float()
    type_emb = _gelu(_linear(T, p["emb_node_type"]["kernel"],
                             p["emb_node_type"]["bias"]))

    js = torch.pow(1.1, torch.arange(half).float())[None, :]
    Bmat = torch.sin(js * _t(node_score).reshape(-1, 1))
    score_emb = _gelu(_linear(Bmat, p["emb_score"]["kernel"],
                              p["emb_score"]["bias"]))

    X = _t(H).reshape(-1, dim)
    extra = torch.cat([type_emb, score_emb], dim=1)
    ntype_flat = torch.tensor(np.asarray(node_type).reshape(-1))
    n_total = X.shape[0]
    src = torch.tensor(edge_index[0])
    dst = torch.tensor(edge_index[1])
    etype = torch.tensor(edge_type)

    enc = p["edge_encoder"]
    for layer in range(K):
        lp = p[f"gnn_layer_{layer}"]

        # ---- edge features + encoder (reference :419-433), BN over the
        # E+N row union in TRAIN mode ---------------------------------
        edge_vec = torch.nn.functional.one_hot(etype, N_ETYPE + 1).float()
        self_edge_vec = torch.zeros(n_total, N_ETYPE + 1)
        self_edge_vec[:, N_ETYPE] = 1.0
        head_vec = torch.nn.functional.one_hot(ntype_flat[src],
                                               N_NTYPE).float()
        tail_vec = torch.nn.functional.one_hot(ntype_flat[dst],
                                               N_NTYPE).float()
        self_ht = torch.nn.functional.one_hot(ntype_flat, N_NTYPE).float()
        feat = torch.cat(
            [torch.cat([edge_vec, head_vec, tail_vec], dim=1),
             torch.cat([self_edge_vec, self_ht, self_ht], dim=1)], dim=0)
        h0 = _linear(feat, enc["linear_0"]["kernel"],
                     enc["linear_0"]["bias"])
        h0 = torch.relu(_bn_train(h0, enc["bn"]["scale"],
                                  enc["bn"]["bias"]))
        edge_emb = _linear(h0, enc["linear_1"]["kernel"],
                           enc["linear_1"]["bias"])            # [E+N, D]

        # ---- self loops appended (reference :436-438) ----------------
        loop = torch.arange(n_total)
        src_a = torch.cat([src, loop])
        dst_a = torch.cat([dst, loop])

        x = torch.cat([X, extra], dim=1)                       # [n, 2D]
        x_i = x[dst_a]                                         # target
        x_j = x[src_a]                                         # source

        # ---- message (reference :455-484): the reference's 3D-wide
        # concat projections == our decomposed kernels stacked ---------
        w_key = np.concatenate([lp["key_x"]["kernel"],
                                lp["key_e"]["kernel"]], axis=0)
        w_msg = np.concatenate([lp["msg_x"]["kernel"],
                                lp["msg_e"]["kernel"]], axis=0)
        key = _linear(torch.cat([x_i, edge_emb], dim=1), w_key,
                      lp["key_e"]["bias"])
        msg = _linear(torch.cat([x_j, edge_emb], dim=1), w_msg,
                      lp["msg_e"]["bias"])
        query = _linear(x_j, lp["query"]["kernel"], lp["query"]["bias"])
        query = query / math.sqrt(dim // HEADS)

        qh = query.view(-1, HEADS, dim // HEADS)
        kh = key.view(-1, HEADS, dim // HEADS)
        scores = (qh * kh).sum(dim=2)                          # [E+N, H]
        alpha = _segment_softmax_by_src(scores, src_a, n_total)
        ones = torch.ones(src_a.shape[0])
        count = torch.zeros(n_total).index_add_(0, src_a, ones)
        alpha = alpha * count[src_a][:, None]
        out = (msg.view(-1, HEADS, dim // HEADS)
               * alpha[:, :, None]).reshape(-1, dim)
        aggr = torch.zeros(n_total, dim).index_add_(0, dst_a, out)

        # ---- conv output MLP (reference :408,443) --------------------
        o = _linear(aggr, lp["out_linear_0"]["kernel"],
                    lp["out_linear_0"]["bias"])
        o = torch.relu(_bn_train(o, lp["out_bn"]["scale"],
                                 lp["out_bn"]["bias"]))
        o = _linear(o, lp["out_linear_1"]["kernel"],
                    lp["out_linear_1"]["bias"])

        # ---- mp_helper: GELU + dropout(0) (reference :45-50) ---------
        X = _gelu(o)

    Xb = X.reshape(B, N, dim)
    out = _gelu(_linear(_t(H), p["Vh"]["kernel"], p["Vh"]["bias"])
                + _linear(Xb, p["Vx"]["kernel"], p["Vx"]["bias"]))
    return out.numpy()


def test_flax_mp_matches_independent_torch_reference():
    rng = np.random.default_rng(3)
    G, N, E = 3, 10, 24
    H = rng.standard_normal((G, N, D)).astype(np.float32)
    node_type = rng.integers(0, N_NTYPE, (G, N))
    node_score = rng.standard_normal((G, N)).astype(np.float32)

    # padded masked edges for the flax module; the SAME real edges as
    # dynamic global lists for the torch reference
    src = rng.integers(0, N, (G, E)).astype(np.int32)
    dst = rng.integers(0, N, (G, E)).astype(np.int32)
    etype = rng.integers(0, N_ETYPE, (G, E)).astype(np.int32)
    mask = rng.random((G, E)) > 0.3

    gsrc, gdst, gtyp = [], [], []
    for g in range(G):
        keep = mask[g]
        gsrc.append(src[g][keep] + g * N)
        gdst.append(dst[g][keep] + g * N)
        gtyp.append(etype[g][keep])
    edge_index = np.stack([np.concatenate(gsrc), np.concatenate(gdst)])
    edge_type_flat = np.concatenate(gtyp).astype(np.int64)

    mp = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                             hidden_size=D, dropout=0.0, head_count=HEADS,
                             backend="scatter")
    args = (jnp.asarray(H), jnp.asarray(node_type), jnp.asarray(node_score),
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(etype),
            jnp.asarray(mask))
    variables = mp.init(jax.random.PRNGKey(0), *args, train=False)
    got, _ = mp.apply(variables, *args, train=True,
                      mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})

    want = torch_reference_mp(
        jax.tree.map(np.asarray, variables["params"]["gnn"]
                     if "gnn" in variables["params"] else variables["params"]),
        variables.get("batch_stats", {}),
        H, node_type, node_score, edge_index, edge_type_flat)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# full decoder: QAGNN.forward (reference modeling_qagnn.py:99-189) in torch
# ---------------------------------------------------------------------------

def _pooler_torch(p, q, k, mask, n_head):
    """MultiheadAttPoolLayer (reference utils/layers.py:324-371) +
    MatrixVectorScaledDotProductAttention (:276-299), eval mode."""
    bs, L, dk_orig = k.shape
    d_k = dk_orig // n_head
    qs = _linear(q, p["w_qs"]["kernel"], p["w_qs"]["bias"]) \
        .view(bs, n_head, d_k)
    ks = _linear(k, p["w_ks"]["kernel"], p["w_ks"]["bias"]) \
        .view(bs, L, n_head, d_k)
    vs = _linear(k, p["w_vs"]["kernel"], p["w_vs"]["bias"]) \
        .view(bs, L, n_head, d_k)
    qs = qs.permute(1, 0, 2).reshape(n_head * bs, d_k)
    ks = ks.permute(2, 0, 1, 3).reshape(n_head * bs, L, d_k)
    vs = vs.permute(2, 0, 1, 3).reshape(n_head * bs, L, d_k)
    mask = mask.repeat(n_head, 1)
    attn = (qs.unsqueeze(1) * ks).sum(2) / math.sqrt(d_k)
    attn = attn.masked_fill(mask, float("-inf"))
    attn = torch.softmax(attn, dim=1)
    out = (attn.unsqueeze(2) * vs).sum(1)
    out = out.view(n_head, bs, d_k).permute(1, 0, 2).reshape(bs, -1)
    return out


def torch_reference_decoder(params, sent_vecs, concept_ids, node_type,
                            node_scores, adj_lengths, edge_index, edge_type,
                            n_attention_head, fc_layers):
    """QAGNN.forward in EVAL mode (BN running stats (0, 1), no dropout) —
    reference modeling/modeling_qagnn.py:141-189 + CustomizedEmbedding
    (utils/layers.py:571-607) + MLP (:47-82, layer_norm)."""
    p = params
    G, N = concept_ids.shape
    sv = _t(sent_vecs)

    gnn_input0 = _gelu(_linear(sv, p["svec2nvec"]["kernel"],
                               p["svec2nvec"]["bias"])).unsqueeze(1)
    table = _t(p["concept_emb"]["emb"]["embedding"])
    idx = torch.tensor(np.asarray(concept_ids[:, 1:] - 1, np.int64))
    looked = table[idx]
    gnn_input1 = _gelu(_linear(looked,
                               p["concept_emb"]["cpt_transform"]["kernel"],
                               p["concept_emb"]["cpt_transform"]["bias"]))
    gnn_input = torch.cat([gnn_input0, gnn_input1], dim=1)

    # score normalization (reference :159-167)
    lens = torch.tensor(np.asarray(adj_lengths, np.float32))
    arange = torch.arange(N)[None, :]
    m = (arange < lens[:, None]).float()
    s = -_t(node_scores)
    s = s - s[:, 0:1]
    s = s * m
    mean_norm = s.abs().sum(1) / lens
    s = s / (mean_norm[:, None] + 1e-05)

    gnn_out = torch.tensor(torch_reference_mp_eval(
        p["gnn"], gnn_input.numpy(), node_type, s.numpy(),
        edge_index, edge_type))

    z = gnn_out[:, 0]
    mask = arange >= lens[:, None]
    mask = mask | (torch.tensor(np.asarray(node_type)) == 3)
    allm = mask.all(1)
    mask[allm, 0] = False
    graph_vecs = _pooler_torch(p["pooler"], sv, gnn_out, mask,
                               n_attention_head)

    concat = torch.cat([graph_vecs, sv, z], dim=1)
    x = concat
    for i in range(fc_layers + 1):
        x = _linear(x, p["fc"][f"linear_{i}"]["kernel"],
                    p["fc"][f"linear_{i}"]["bias"])
        if i < fc_layers:
            ln = p["fc"][f"layernorm_{i}"]
            mu = x.mean(-1, keepdim=True)
            var = ((x - mu) ** 2).mean(-1, keepdim=True)
            x = (x - mu) / torch.sqrt(var + 1e-5) * _t(ln["scale"]) \
                + _t(ln["bias"])
            x = _gelu(x)
    return x.numpy()


def torch_reference_mp_eval(p, H, node_type, node_score, edge_index,
                            edge_type):
    """torch_reference_mp but with the BatchNorms in EVAL mode (running
    stats (0, 1)) — the decoder parity runs eval end-to-end because the
    reference pooler carries a hardcoded train-mode dropout."""
    B, N, dim = H.shape
    half = dim // 2

    def _bn_eval(x, scale, bias, eps=1e-5):
        return x / math.sqrt(1.0 + eps) * _t(scale) + _t(bias)

    T = torch.nn.functional.one_hot(
        torch.tensor(np.asarray(node_type).reshape(-1)), N_NTYPE).float()
    type_emb = _gelu(_linear(T, p["emb_node_type"]["kernel"],
                             p["emb_node_type"]["bias"]))
    js = torch.pow(1.1, torch.arange(half).float())[None, :]
    Bmat = torch.sin(js * _t(node_score).reshape(-1, 1))
    score_emb = _gelu(_linear(Bmat, p["emb_score"]["kernel"],
                              p["emb_score"]["bias"]))
    X = _t(H).reshape(-1, dim)
    extra = torch.cat([type_emb, score_emb], dim=1)
    ntype_flat = torch.tensor(np.asarray(node_type).reshape(-1))
    n_total = X.shape[0]
    src = torch.tensor(edge_index[0])
    dst = torch.tensor(edge_index[1])
    etype = torch.tensor(edge_type)
    enc = p["edge_encoder"]
    for layer in range(K):
        lp = p[f"gnn_layer_{layer}"]
        edge_vec = torch.nn.functional.one_hot(etype, N_ETYPE + 1).float()
        self_edge_vec = torch.zeros(n_total, N_ETYPE + 1)
        self_edge_vec[:, N_ETYPE] = 1.0
        head_vec = torch.nn.functional.one_hot(ntype_flat[src],
                                               N_NTYPE).float()
        tail_vec = torch.nn.functional.one_hot(ntype_flat[dst],
                                               N_NTYPE).float()
        self_ht = torch.nn.functional.one_hot(ntype_flat, N_NTYPE).float()
        feat = torch.cat(
            [torch.cat([edge_vec, head_vec, tail_vec], dim=1),
             torch.cat([self_edge_vec, self_ht, self_ht], dim=1)], dim=0)
        h0 = _linear(feat, enc["linear_0"]["kernel"],
                     enc["linear_0"]["bias"])
        h0 = torch.relu(_bn_eval(h0, enc["bn"]["scale"], enc["bn"]["bias"]))
        edge_emb = _linear(h0, enc["linear_1"]["kernel"],
                           enc["linear_1"]["bias"])
        loop = torch.arange(n_total)
        src_a = torch.cat([src, loop])
        dst_a = torch.cat([dst, loop])
        x = torch.cat([X, extra], dim=1)
        x_i, x_j = x[dst_a], x[src_a]
        w_key = np.concatenate([lp["key_x"]["kernel"],
                                lp["key_e"]["kernel"]], axis=0)
        w_msg = np.concatenate([lp["msg_x"]["kernel"],
                                lp["msg_e"]["kernel"]], axis=0)
        key = _linear(torch.cat([x_i, edge_emb], dim=1), w_key,
                      lp["key_e"]["bias"])
        msg = _linear(torch.cat([x_j, edge_emb], dim=1), w_msg,
                      lp["msg_e"]["bias"])
        query = _linear(x_j, lp["query"]["kernel"], lp["query"]["bias"])
        query = query / math.sqrt(dim // HEADS)
        scores = (query.view(-1, HEADS, dim // HEADS)
                  * key.view(-1, HEADS, dim // HEADS)).sum(2)
        alpha = _segment_softmax_by_src(scores, src_a, n_total)
        ones = torch.ones(src_a.shape[0])
        count = torch.zeros(n_total).index_add_(0, src_a, ones)
        alpha = alpha * count[src_a][:, None]
        out = (msg.view(-1, HEADS, dim // HEADS)
               * alpha[:, :, None]).reshape(-1, dim)
        aggr = torch.zeros(n_total, dim).index_add_(0, dst_a, out)
        o = _linear(aggr, lp["out_linear_0"]["kernel"],
                    lp["out_linear_0"]["bias"])
        o = torch.relu(_bn_eval(o, lp["out_bn"]["scale"],
                                lp["out_bn"]["bias"]))
        o = _linear(o, lp["out_linear_1"]["kernel"],
                    lp["out_linear_1"]["bias"])
        X = _gelu(o)
    Xb = X.reshape(B, N, dim)
    out = _gelu(_linear(_t(H), p["Vh"]["kernel"], p["Vh"]["bias"])
                + _linear(Xb, p["Vx"]["kernel"], p["Vx"]["bias"]))
    return out.numpy()


def test_flax_decoder_matches_independent_torch_reference():
    """The FULL QAGNN decoder (context projection, entity embedding,
    score normalization, k-layer MP, Z-vec, pool mask + multi-head
    attention pooler, scorer MLP with LayerNorm) against the independent
    torch implementation of reference modeling_qagnn.py:99-189."""
    from qagnn_tpu.graph.container import BatchedGraphs
    from qagnn_tpu.models.qagnn import QAGNN

    rng = np.random.default_rng(7)
    G, N, E, SENT, FC = 3, 10, 20, 12, 8
    N_CONCEPT, CIN = 40, 6
    sent_vecs = rng.standard_normal((G, SENT)).astype(np.float32)
    num_nodes = rng.integers(4, N + 1, G)
    concept_ids = rng.integers(1, N_CONCEPT, (G, N))
    concept_ids[:, 0] = 0
    node_type = rng.integers(0, 3, (G, N))
    node_type[:, 0] = 3
    node_scores = rng.standard_normal((G, N)).astype(np.float32)
    src = np.stack([rng.integers(0, num_nodes[g], E) for g in range(G)])
    dst = np.stack([rng.integers(0, num_nodes[g], E) for g in range(G)])
    etype = rng.integers(0, N_ETYPE, (G, E)).astype(np.int32)
    mask = rng.random((G, E)) > 0.3

    gsrc, gdst, gtyp = [], [], []
    for g in range(G):
        keep = mask[g]
        gsrc.append(src[g][keep] + g * N)
        gdst.append(dst[g][keep] + g * N)
        gtyp.append(etype[g][keep])
    edge_index = np.stack([np.concatenate(gsrc), np.concatenate(gdst)])
    edge_type_flat = np.concatenate(gtyp).astype(np.int64)

    graph = BatchedGraphs(
        concept_ids=jnp.asarray(concept_ids, jnp.int32),
        node_types=jnp.asarray(node_type, jnp.int32),
        node_scores=jnp.asarray(node_scores),
        num_nodes=jnp.asarray(num_nodes, jnp.int32),
        edge_src=jnp.asarray(src, jnp.int32),
        edge_dst=jnp.asarray(dst, jnp.int32),
        edge_type=jnp.asarray(etype),
        edge_mask=jnp.asarray(mask))

    model = QAGNN(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE, sent_dim=SENT,
                  n_concept=N_CONCEPT, concept_dim=D, concept_in_dim=CIN,
                  n_attention_head=2, fc_dim=FC, n_fc_layer=1,
                  p_emb=0.0, p_gnn=0.0, p_fc=0.0, gnn_backend="scatter")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(sent_vecs),
                           graph, train=False)
    got = model.apply(variables, jnp.asarray(sent_vecs), graph, train=False)

    want = torch_reference_decoder(
        jax.tree.map(np.asarray, variables["params"]),
        sent_vecs, concept_ids, node_type, node_scores, num_nodes,
        edge_index, edge_type_flat, n_attention_head=2, fc_layers=1)

    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)
