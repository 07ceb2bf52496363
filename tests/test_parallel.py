"""Multi-device sharding correctness on the virtual 8-device CPU mesh:
data-parallel and edge-partitioned runs must equal the single-device result,
proving GSPMD inserts the right collectives for the segment/one-hot ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qagnn_tpu.graph.batching import batch_edge_lists
from qagnn_tpu.models.gnn import QAGNNMessagePassing
from qagnn_tpu.parallel.graph_sharding import shard_graph
from qagnn_tpu.parallel.mesh import make_mesh, replicated, shard_batch

N_NTYPE, N_ETYPE, K, D = 4, 6, 2, 8


def _graphs(rng, n_graphs=8, n_nodes=8, e_budget=16):
    edge_indices, edge_types = [], []
    num_nodes = rng.integers(2, n_nodes + 1, size=n_graphs)
    for g in range(n_graphs):
        ne = int(rng.integers(1, 12))
        edge_indices.append(
            rng.integers(0, num_nodes[g], (2, ne)).astype(np.int64))
        edge_types.append(rng.integers(0, N_ETYPE, ne).astype(np.int64))
    concept_ids = rng.integers(1, 50, (n_graphs, n_nodes))
    node_types = rng.integers(0, 3, (n_graphs, n_nodes))
    node_scores = rng.standard_normal((n_graphs, n_nodes)).astype(np.float32)
    return batch_edge_lists(edge_indices, edge_types, concept_ids,
                            node_types, node_scores, num_nodes,
                            edges_per_graph=e_budget)


@pytest.fixture(scope="module")
def model_and_data():
    rng = np.random.default_rng(0)
    graph = _graphs(rng)
    H = jnp.asarray(rng.standard_normal(
        (graph.n_graphs, graph.nodes_per_graph, D)), jnp.float32)
    model = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D, dropout=0.0,
                                backend="onehot")
    variables = model.init(jax.random.PRNGKey(0), H, graph.node_types,
                           graph.node_scores, graph.edge_src, graph.edge_dst,
                           graph.edge_type, graph.edge_mask, train=False)

    def fwd(variables, H, graph):
        return model.apply(variables, H, graph.node_types, graph.node_scores,
                           graph.edge_src, graph.edge_dst, graph.edge_type,
                           graph.edge_mask, train=False)

    want = np.asarray(fwd(variables, H, graph))
    return fwd, variables, H, graph, want


def test_data_parallel_matches_single_device(model_and_data):
    fwd, variables, H, graph, want = model_and_data
    mesh = make_mesh(8, 1)
    with mesh:
        v = jax.device_put(variables, replicated(mesh))
        Hs = jax.device_put(H, NamedSharding(mesh, P("data")))
        gs = shard_graph(graph, mesh, edge_partition=False)
        got = jax.jit(fwd)(v, Hs, gs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_edge_partition_matches_single_device(model_and_data):
    fwd, variables, H, graph, want = model_and_data
    mesh = make_mesh(2, 4)   # 2-way data x 4-way edge partition
    with mesh:
        v = jax.device_put(variables, replicated(mesh))
        Hs = jax.device_put(H, NamedSharding(mesh, P("data")))
        gs = shard_graph(graph, mesh, edge_partition=True)
        got = jax.jit(fwd)(v, Hs, gs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_edge_partition_gradients_match(model_and_data):
    fwd, variables, H, graph, want = model_and_data

    def loss(v, H, g):
        return jnp.sum(fwd(v, H, g) ** 2)

    g_single = jax.grad(loss)(variables, H, graph)
    mesh = make_mesh(2, 4)
    with mesh:
        v = jax.device_put(variables, replicated(mesh))
        Hs = jax.device_put(H, NamedSharding(mesh, P("data")))
        gs = shard_graph(graph, mesh, edge_partition=True)
        g_sharded = jax.jit(jax.grad(loss))(v, Hs, gs)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_shard_map_edge_partition_matches_scatter_oracle(model_and_data):
    """The EXPLICIT shard_map edge partitioning (parallel/edge_shard_map) —
    3 collectives per layer — must match the scatter oracle, forward and
    gradients, on a (2 data x 4 model) virtual mesh."""
    from qagnn_tpu.ops.gat_attention import relational_gat_attention_nodes
    from qagnn_tpu.parallel.edge_shard_map import edge_sharded_gat_nodes

    rng = np.random.default_rng(5)
    G, N, E, H, Dh = 4, 8, 16, 2, 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    nq, nk, nm = f(G, N, H, Dh), f(G, N, H, Dh), f(G, N, H, Dh)
    ekb, emb = f(G, E, H, Dh), f(G, E, H, Dh)
    skb, smb = f(G, N, H, Dh), f(G, N, H, Dh)
    src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    mask = jnp.asarray(rng.random((G, E)) > 0.25, bool)

    args = (nq, nk, nm, ekb, emb, skb, smb)

    def loss_oracle(args):
        out = relational_gat_attention_nodes(*args, src, dst, mask,
                                             backend="scatter")
        return jnp.sum(out ** 2), out

    mesh = make_mesh(2, 4)

    def loss_sharded(args):
        out = edge_sharded_gat_nodes(*args, src, dst, mask, mesh=mesh)
        return jnp.sum(out ** 2), out

    (l1, out1), g1 = jax.value_and_grad(loss_oracle, has_aux=True)(args)
    with mesh:
        (l2, out2), g2 = jax.jit(
            jax.value_and_grad(loss_sharded, has_aux=True))(args)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_edge_sharded_pallas_matches_single_device():
    """The PRODUCTION kernels under explicit edge partitioning:
    qagnn_tpu.parallel.edge_shard_pallas runs the fused Pallas passes per
    model-axis shard with psum/pmax between them (GSPMD cannot partition a
    Mosaic custom call). Values and all cotangents must match the
    single-device fused op (itself oracle-checked in test_pallas_gat)."""
    from qagnn_tpu.ops.pallas_gat import pallas_relational_gat_projected
    from qagnn_tpu.parallel.edge_shard_pallas import (
        pallas_edge_sharded_projected)

    rng = np.random.default_rng(5)
    G, N, E, HD, H_, D_IN = 4, 8, 16, 8, 2, 8
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    nq, nk, nm = f(G, N, HD), f(G, N, HD), f(G, N, HD)
    emb_t = f(G, D_IN, E)
    wke, bke, wme, bme = f(D_IN, HD), f(HD), f(D_IN, HD), f(HD)
    skb, smb = f(G, N, HD), f(G, N, HD)
    src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    mask = jnp.asarray(rng.random((G, E)) > 0.25, jnp.float32)

    diff = (nq, nk, nm, emb_t, wke, bke, wme, bme, skb, smb)

    def loss_single(args):
        return jnp.sum(pallas_relational_gat_projected(
            *args, src, dst, mask, H_, True) ** 2)

    mesh = make_mesh(2, 4)   # 2-way data x 4-way edge partition

    def loss_sharded(args):
        return jnp.sum(pallas_edge_sharded_projected(
            *args, src, dst, mask, H_, mesh, True) ** 2)

    with mesh:
        v1, g1 = jax.value_and_grad(loss_sharded)(diff)
    v2, g2 = jax.value_and_grad(loss_single)(diff)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_model_level_pallas_edge_partition_matches_scatter(model_and_data):
    """QAGNNMessagePassing(mesh=..., backend='pallas') — the form the DRIVER
    builds when mesh_model>1 — runs the fused kernels edge-partitioned and
    must match the single-device scatter oracle in values AND gradients
    (params + inputs), train mode included (BN batch stats flow through the
    sharded path's XLA encoder)."""
    _, variables, H, graph, want = model_and_data
    mesh = make_mesh(2, 4)

    def build(backend, m):
        return QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                   hidden_size=D, dropout=0.0,
                                   backend=backend, mesh=m)

    def loss(model):
        def f(v, H):
            out = model.apply(v, H, graph.node_types, graph.node_scores,
                              graph.edge_src, graph.edge_dst,
                              graph.edge_type, graph.edge_mask, train=False)
            return jnp.sum(out ** 2)
        return f

    l_ref, g_ref = jax.value_and_grad(loss(build("scatter", None)),
                                      argnums=(0, 1))(variables, H)
    with mesh:
        v = jax.device_put(variables, replicated(mesh))
        Hs = jax.device_put(H, NamedSharding(mesh, P("data")))
        gs = shard_graph(graph, mesh, edge_partition=True)

        def f_sharded(v, Hs):
            model = build("pallas", mesh)
            out = model.apply(v, Hs, gs.node_types, gs.node_scores,
                              gs.edge_src, gs.edge_dst, gs.edge_type,
                              gs.edge_mask, train=False)
            return jnp.sum(out ** 2)

        l_sh, g_sh = jax.jit(
            jax.value_and_grad(f_sharded, argnums=(0, 1)))(v, Hs)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_model_level_pallas_edge_partition_train_mode(model_and_data):
    """Train mode through the sharded fused path: BN batch statistics and
    their EMA updates must match the scatter oracle's."""
    _, variables, H, graph, _ = model_and_data
    mesh = make_mesh(2, 4)

    def run(backend, m, v, Hs, g):
        model = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                    hidden_size=D, dropout=0.0,
                                    backend=backend, mesh=m)
        out, upd = model.apply(v, Hs, g.node_types, g.node_scores,
                               g.edge_src, g.edge_dst, g.edge_type,
                               g.edge_mask, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
        return out, upd["batch_stats"]

    out_ref, bs_ref = run("scatter", None, variables, H, graph)
    with mesh:
        v = jax.device_put(variables, replicated(mesh))
        Hs = jax.device_put(H, NamedSharding(mesh, P("data")))
        gs = shard_graph(graph, mesh, edge_partition=True)
        out_sh, bs_sh = jax.jit(
            lambda v, Hs: run("pallas", mesh, v, Hs, gs))(v, Hs)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=5e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(bs_ref), jax.tree.leaves(bs_sh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
