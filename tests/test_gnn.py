"""Parity tests for the GNN core against an independent numpy oracle.

The oracle implements the reference math (modeling/modeling_qagnn.py:380-484,
7-95) the way the reference executes it — dynamic per-graph edge lists with
self-loops materialized as real edges, softmax grouped by source node,
out-degree rescale, scatter-add aggregation — using plain numpy loops. The
framework path uses fixed shapes, masks, and the analytic self-loop join;
agreement proves the re-design preserves semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qagnn_tpu.graph.batching import batch_edge_lists
from qagnn_tpu.models.gnn import QAGNNMessagePassing
from qagnn_tpu.models.qagnn import QAGNN, LMQAGNN, normalize_node_scores
from qagnn_tpu.graph.container import BatchedGraphs

N_NTYPE, N_ETYPE = 4, 6
K, D, HEADS = 2, 8, 2


def _rand_graphs(rng, n_graphs=3, n_nodes=6, e_budget=16):
    """Random small graphs with variable real node/edge counts."""
    edge_indices, edge_types = [], []
    num_nodes = rng.integers(2, n_nodes + 1, size=n_graphs)
    for g in range(n_graphs):
        nn_ = num_nodes[g]
        ne = rng.integers(1, 10)
        src = rng.integers(0, nn_, ne)
        dst = rng.integers(0, nn_, ne)
        edge_indices.append(np.stack([src, dst]))
        edge_types.append(rng.integers(0, N_ETYPE, ne))
    concept_ids = rng.integers(1, 50, size=(n_graphs, n_nodes))
    concept_ids[:, 0] = 0
    node_types = rng.integers(0, 3, size=(n_graphs, n_nodes))
    node_types[:, 0] = 3
    node_scores = rng.standard_normal((n_graphs, n_nodes)).astype(np.float32)
    return batch_edge_lists(
        [e.astype(np.int64) for e in edge_indices],
        [t.astype(np.int64) for t in edge_types],
        concept_ids, node_types, node_scores, num_nodes,
        edges_per_graph=e_budget)


def _dense(params, name, x):
    p = params[name]
    return x @ np.asarray(p["kernel"]) + (np.asarray(p["bias"])
                                          if "bias" in p else 0.0)


def _gelu(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi)
                                    * (x + 0.044715 * x ** 3)))


def _bn_eval(params, stats, x):
    mean, var = np.asarray(stats["mean"]), np.asarray(stats["var"])
    scale, bias = np.asarray(params["scale"]), np.asarray(params["bias"])
    return (x - mean) / np.sqrt(var + 1e-5) * scale + bias


def oracle_forward(variables, H, graph: BatchedGraphs, node_scores):
    params = variables["params"]
    stats = variables["batch_stats"]
    G, N = graph.node_types.shape
    half = D // 2

    node_types = np.asarray(graph.node_types)
    # node-type + score embeddings
    T = np.eye(N_NTYPE, dtype=np.float32)[node_types]            # (G,N,4)
    type_emb = _gelu(_dense(params, "emb_node_type", T))
    js = 1.1 ** np.arange(half, dtype=np.float32)
    B = np.sin(js[None, None, :] * np.asarray(node_scores)[:, :, None])
    score_emb = _gelu(_dense(params, "emb_score", B))
    extra = np.concatenate([type_emb, score_emb], -1)            # (G,N,D)

    ee = params["edge_encoder"]
    ee_stats = stats["edge_encoder"]

    out = np.zeros((G, N, D), np.float32)
    X_all = np.array(H, np.float32)

    # run each graph independently with a dynamic edge list (reference style)
    for g in range(G):
        e_real = np.asarray(graph.edge_mask[g])
        src = np.asarray(graph.edge_src[g])[e_real]
        dst = np.asarray(graph.edge_dst[g])[e_real]
        et = np.asarray(graph.edge_type[g])[e_real]
        # append self-loops for ALL N nodes (reference :436-438 over padded batch)
        loop = np.arange(N)
        src_f = np.concatenate([src, loop])
        dst_f = np.concatenate([dst, loop])

        # edge features: one-hot rel (+ self-loop type N_ETYPE), head/tail types
        rel = np.zeros((len(src_f), N_ETYPE + 1), np.float32)
        rel[np.arange(len(src)), et] = 1
        rel[len(src):, N_ETYPE] = 1
        ht = np.concatenate([
            np.eye(N_NTYPE, dtype=np.float32)[node_types[g][src_f]],
            np.eye(N_NTYPE, dtype=np.float32)[node_types[g][dst_f]]], -1)
        feat = np.concatenate([rel, ht], -1)
        h1 = _dense(ee, "linear_0", feat)
        h1 = _bn_eval(ee["bn"], ee_stats["bn"], h1)
        h1 = np.maximum(h1, 0)
        edge_emb = _dense(ee, "linear_1", h1)                    # (E+N, D)

        X = X_all[g].copy()
        for layer in range(K):
            lp = params[f"gnn_layer_{layer}"]
            ls = stats[f"gnn_layer_{layer}"]
            xc = np.concatenate([X, extra[g]], -1)               # (N, 2D)
            x_i, x_j = xc[dst_f], xc[src_f]
            # reconstruct W_k [x_i ‖ e] = A_k x_i + B_k e (+ bias once)
            key = (x_i @ np.asarray(lp["key_x"]["kernel"])
                   + _dense(lp, "key_e", edge_emb))
            msg = (x_j @ np.asarray(lp["msg_x"]["kernel"])
                   + _dense(lp, "msg_e", edge_emb))
            query = _dense(lp, "query", x_j) / np.sqrt(D // HEADS)
            key = key.reshape(-1, HEADS, D // HEADS)
            msg = msg.reshape(-1, HEADS, D // HEADS)
            query = query.reshape(-1, HEADS, D // HEADS)
            scores = (query * key).sum(-1)                       # (E+N, H)
            # softmax grouped by src
            alpha = np.zeros_like(scores)
            for n in range(N):
                grp = src_f == n
                if grp.any():
                    s = scores[grp]
                    e = np.exp(s - s.max(0, keepdims=True))
                    alpha[grp] = e / e.sum(0, keepdims=True)
            deg = np.bincount(src_f, minlength=N).astype(np.float32)
            alpha = alpha * deg[src_f][:, None]
            m = msg * alpha[:, :, None]
            aggr = np.zeros((N, D), np.float32)
            np.add.at(aggr, dst_f, m.reshape(len(src_f), D))
            # output MLP
            o = _dense(lp, "out_linear_0", aggr)
            o = _bn_eval(lp["out_bn"], ls["out_bn"], o)
            o = np.maximum(o, 0)
            o = _dense(lp, "out_linear_1", o)
            X = _gelu(o)
        out[g] = X

    combined = _gelu(_dense(params, "Vh", np.asarray(H))
                     + _dense(params, "Vx", out))
    return combined


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    graph = _rand_graphs(rng)
    G, N = graph.node_types.shape
    H = rng.standard_normal((G, N, D)).astype(np.float32)
    mp = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                             hidden_size=D, dropout=0.0, head_count=HEADS)
    variables = mp.init(jax.random.PRNGKey(0), jnp.asarray(H),
                        graph.node_types, graph.node_scores,
                        graph.edge_src, graph.edge_dst,
                        graph.edge_type, graph.edge_mask, train=False)
    # randomize running stats so eval-mode BN is a nontrivial check
    def jitter(t):
        return jax.tree.map(
            lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
            if a.ndim else a, t)
    variables = {"params": variables["params"],
                 "batch_stats": jitter(variables["batch_stats"])}
    return mp, variables, graph, H


def test_message_passing_matches_numpy_oracle(setup):
    mp, variables, graph, H = setup
    got = mp.apply(variables, jnp.asarray(H), graph.node_types,
                   graph.node_scores, graph.edge_src, graph.edge_dst,
                   graph.edge_type, graph.edge_mask, train=False)
    want = oracle_forward(variables, H, graph, np.asarray(graph.node_scores))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_normalize_node_scores_matches_reference_math():
    rng = np.random.default_rng(1)
    G, N = 4, 7
    scores = rng.standard_normal((G, N)).astype(np.float32)
    num_nodes = np.array([7, 3, 5, 1], np.int32)
    mask = np.arange(N)[None, :] < num_nodes[:, None]
    got = np.asarray(normalize_node_scores(
        jnp.asarray(scores), jnp.asarray(mask), jnp.asarray(num_nodes)))
    # independent numpy version of reference modeling/modeling_qagnn.py:159-167
    s = -scores
    s = s - s[:, 0:1]
    s = s * mask
    mean_norm = np.abs(s).sum(1) / num_nodes
    want = s / (mean_norm[:, None] + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_qagnn_decoder_shapes_and_grad():
    rng = np.random.default_rng(2)
    graph = _rand_graphs(rng, n_graphs=4)
    sent_dim = 12
    sent_vecs = jnp.asarray(rng.standard_normal((4, sent_dim)), jnp.float32)
    model = QAGNN(k=1, n_ntype=N_NTYPE, n_etype=N_ETYPE, sent_dim=sent_dim,
                  n_concept=50, concept_dim=D, concept_in_dim=16,
                  n_attention_head=2, fc_dim=8, n_fc_layer=0)
    variables = model.init(jax.random.PRNGKey(0), sent_vecs, graph)
    logits = model.apply(variables, sent_vecs, graph)
    assert logits.shape == (4, 1)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          sent_vecs, graph)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least one nonzero gradient per top-level module
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_lm_qagnn_end_to_end_with_dummy_encoder():
    import flax.linen as nn

    class DummyEncoder(nn.Module):
        sent_dim: int

        @nn.compact
        def __call__(self, input_ids, attention_mask, *, layer_id=-1,
                     train=False):
            emb = nn.Embed(100, self.sent_dim)(input_ids)
            m = attention_mask[..., None].astype(emb.dtype)
            return (emb * m).sum(1) / jnp.maximum(m.sum(1), 1.0)

    rng = np.random.default_rng(3)
    bs, nc, L, sent_dim = 2, 3, 5, 12
    graph = _rand_graphs(rng, n_graphs=bs * nc)
    lm_inputs = {
        "input_ids": jnp.asarray(rng.integers(0, 100, (bs, nc, L))),
        "attention_mask": jnp.ones((bs, nc, L), jnp.int32),
    }
    model = LMQAGNN(encoder=DummyEncoder(sent_dim=sent_dim),
                    sent_dim=sent_dim, k=1, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                    n_concept=50, concept_dim=D, concept_in_dim=16,
                    n_attention_head=2, fc_dim=8, n_fc_layer=0)
    variables = model.init(jax.random.PRNGKey(0), lm_inputs, graph)
    logits = model.apply(variables, lm_inputs, graph)
    assert logits.shape == (bs, nc)
    assert np.isfinite(np.asarray(logits)).all()


def test_onehot_backend_matches_scatter_backend(setup):
    """The MXU one-hot path and the scatter path must agree."""
    mp, variables, graph, H = setup
    mp_oh = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend="onehot")
    mp_sc = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend="scatter")
    args = (jnp.asarray(H), graph.node_types, graph.node_scores,
            graph.edge_src, graph.edge_dst, graph.edge_type, graph.edge_mask)
    a = mp_oh.apply(variables, *args, train=False)
    b = mp_sc.apply(variables, *args, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-5)


def test_onehot_backend_gradients_match_scatter(setup):
    mp, variables, graph, H = setup

    def loss(params, backend):
        m = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend=backend)
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      jnp.asarray(H), graph.node_types, graph.node_scores,
                      graph.edge_src, graph.edge_dst, graph.edge_type,
                      graph.edge_mask, train=False)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(variables["params"], "onehot")
    g2 = jax.grad(loss)(variables["params"], "scatter")
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_pallas_backend_matches_scatter_backend(setup):
    """The fused Pallas path (projected variant through GATConvE, interpret
    mode on CPU) must agree with the scatter path USING THE SAME PARAMS —
    also proves the _ProjParams tree is Dense-compatible."""
    mp, variables, graph, H = setup
    mp_pl = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend="pallas")
    mp_sc = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend="scatter")
    args = (jnp.asarray(H), graph.node_types, graph.node_scores,
            graph.edge_src, graph.edge_dst, graph.edge_type, graph.edge_mask)
    a = mp_pl.apply(variables, *args, train=False)
    b = mp_sc.apply(variables, *args, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_pallas_backend_gradients_match_scatter(setup):
    mp, variables, graph, H = setup

    def loss(params, backend):
        m = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend=backend)
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      jnp.asarray(H), graph.node_types, graph.node_scores,
                      graph.edge_src, graph.edge_dst, graph.edge_type,
                      graph.edge_mask, train=False)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(variables["params"], "pallas")
    g2 = jax.grad(loss)(variables["params"], "scatter")
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree.leaves(g2)
    for (path, a), b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_edge_encoder_bf16_close_to_f32():
    """The bf16 hot-path EdgeEncoder must track the f32 one closely: BN
    statistics stay f32 internally, so drift is bounded by the bf16
    rounding of the Dense outputs."""
    from qagnn_tpu.models.gnn import EdgeEncoder

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((64, 15)), jnp.float32)
    w = jnp.asarray(rng.random(64) > 0.3, jnp.float32)

    enc32 = EdgeEncoder(hidden_size=16, num_updates=2)
    v = enc32.init(jax.random.PRNGKey(0), feat, w, train=False)
    out32, upd32 = enc32.apply(v, feat, w, train=True,
                               mutable=["batch_stats"])

    enc16 = EdgeEncoder(hidden_size=16, num_updates=2, dtype=jnp.bfloat16)
    out16, upd16 = enc16.apply(v, feat.astype(jnp.bfloat16), w, train=True,
                               mutable=["batch_stats"])

    assert out16.dtype == jnp.bfloat16
    scale = float(jnp.abs(out32).max())
    assert float(jnp.abs(out16.astype(jnp.float32) - out32).max()) < 0.05 * scale
    for a, b in zip(jax.tree.leaves(upd16), jax.tree.leaves(upd32)):
        assert a.dtype == jnp.float32   # running stats stay f32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)


def test_pallas_backend_train_mode_matches_scatter(setup):
    """train=True is what cli.train/bench actually run, and on the pallas
    path it exercises the FULLY FUSED edge encoder: edge_feature_moments +
    analytic_edge_moments closed-form BatchNorm batch statistics and the
    multi-part 'moments' MaskedBatchNorm. Values, gradients AND the
    updated BN running stats must all match the scatter oracle's explicit
    two-pass row statistics."""
    mp, variables, graph, H = setup
    args = (jnp.asarray(H), graph.node_types, graph.node_scores,
            graph.edge_src, graph.edge_dst, graph.edge_type, graph.edge_mask)

    def run(backend):
        m = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend=backend)

        def loss(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                *args, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.sum(out ** 2), upd["batch_stats"]

        (val, stats), grads = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        return val, stats, grads

    v1, s1, g1 = run("pallas")
    v2, s2, g2 = run("scatter")
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    flat1 = jax.tree_util.tree_flatten_with_path(s1)[0]
    for (path, a), b in zip(flat1, jax.tree.leaves(s2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg="batch_stats " + jax.tree_util.keystr(path))
    flatg = jax.tree_util.tree_flatten_with_path(g1)[0]
    for (path, a), b in zip(flatg, jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pallas_multi_tile_chained_fused_path(setup, monkeypatch):
    """Force n_tiles > 1 (TILE_E=4, E=16) through the WHOLE fused pallas
    stack — grid-accumulated feature moments, the h kernel, chained /
    aliased cotangents, in-kernel dW accumulators — in train mode, against
    the scatter oracle."""
    import qagnn_tpu.ops.pallas_gat as pgm
    monkeypatch.setattr(pgm, "TILE_E", 4)

    mp, variables, graph, H = setup
    args = (jnp.asarray(H), graph.node_types, graph.node_scores,
            graph.edge_src, graph.edge_dst, graph.edge_type, graph.edge_mask)

    def run(backend):
        m = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend=backend)

        def loss(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                *args, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.sum(out ** 2)

        return jax.value_and_grad(loss)(variables["params"])

    v1, g1 = run("pallas")
    v2, g2 = run("scatter")
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_pallas_ragged_edge_budget_fused_path(monkeypatch):
    """E not divisible by the kernel tile: the fused encoder pads its
    (G, D, E) output and GATConvE's index padding must agree, values
    matching the scatter oracle."""
    import qagnn_tpu.ops.pallas_gat as pgm
    monkeypatch.setattr(pgm, "TILE_E", 8)

    rng = np.random.default_rng(11)
    G_, N_, E_ = 3, 8, 13   # 13 % 8 != 0 -> padded to 16
    H = jnp.asarray(rng.standard_normal((G_, N_, D)), jnp.float32)
    node_type = jnp.asarray(rng.integers(0, N_NTYPE, (G_, N_)), jnp.int32)
    node_score = jnp.asarray(rng.standard_normal((G_, N_)), jnp.float32)
    src = jnp.asarray(rng.integers(0, N_, (G_, E_)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N_, (G_, E_)), jnp.int32)
    etype = jnp.asarray(rng.integers(0, N_ETYPE, (G_, E_)), jnp.int32)
    mask = jnp.asarray(rng.random((G_, E_)) > 0.3, bool)
    args = (H, node_type, node_score, src, dst, etype, mask)

    def run(backend):
        m = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0, head_count=HEADS,
                                backend=backend)
        variables = m.init(jax.random.PRNGKey(0), *args, train=False)
        return m.apply(variables, *args, train=False)

    got = run("pallas")
    want = run("scatter")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_scatter_init_matches_pallas_init():
    """utils.initialization.init_variables (scatter-backend init, no Mosaic)
    produces the variables a pallas-backend init would: identical tree
    structure, shapes and dtypes, values equal up to eager-vs-jit float
    rounding — flax derives param RNG streams from module paths, and the
    fused path's _ProjParams mirror nn.Dense's {kernel, bias} tree by
    construction."""
    from qagnn_tpu.utils.initialization import init_variables

    rng = np.random.default_rng(5)
    G_, N_, E_ = 2, 8, 16
    H = jnp.asarray(rng.standard_normal((G_, N_, D)), jnp.float32)
    node_type = jnp.asarray(rng.integers(0, N_NTYPE, (G_, N_)), jnp.int32)
    node_score = jnp.asarray(rng.standard_normal((G_, N_)), jnp.float32)
    src = jnp.asarray(rng.integers(0, N_, (G_, E_)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N_, (G_, E_)), jnp.int32)
    etype = jnp.asarray(rng.integers(0, N_ETYPE, (G_, E_)), jnp.int32)
    mask = jnp.ones((G_, E_), bool)
    args = (H, node_type, node_score, src, dst, etype, mask)

    m = QAGNNMessagePassing(k=2, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                            hidden_size=D, dropout=0.0, head_count=HEADS,
                            backend="pallas")
    direct = m.init(jax.random.PRNGKey(0), *args, train=False)
    via_scatter = init_variables(m, jax.random.PRNGKey(0), *args, train=False)

    d_flat = jax.tree_util.tree_leaves_with_path(direct)
    s_flat = jax.tree_util.tree_leaves_with_path(via_scatter)
    assert [p for p, _ in d_flat] == [p for p, _ in s_flat]
    for (path, a), (_, b) in zip(d_flat, s_flat):
        assert a.shape == b.shape and a.dtype == b.dtype, path
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8, err_msg=str(path))

    # the forward built from scatter-init variables runs the pallas path
    out = m.apply(via_scatter, *args, train=False)
    ref = QAGNNMessagePassing(k=2, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                              hidden_size=D, dropout=0.0, head_count=HEADS,
                              backend="scatter").apply(
        via_scatter, *args, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
