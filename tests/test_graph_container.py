"""Tests for the BatchedGraphs container and host-side batching."""

import numpy as np
import pytest

from qagnn_tpu.graph import BatchedGraphs, batch_edge_lists, pick_edge_bucket


def _toy_batch(n_graphs=3, n_nodes=8, seed=0, edges_per_graph=None, sort=True):
    rng = np.random.default_rng(seed)
    edge_indices, edge_types = [], []
    for _ in range(n_graphs):
        e = rng.integers(2, 12)
        ei = rng.integers(0, n_nodes, size=(2, e))
        edge_indices.append(ei)
        edge_types.append(rng.integers(0, 5, size=e))
    num_nodes = rng.integers(2, n_nodes + 1, size=n_graphs)
    return batch_edge_lists(
        edge_indices, edge_types,
        concept_ids=rng.integers(0, 100, size=(n_graphs, n_nodes)),
        node_types=rng.integers(0, 4, size=(n_graphs, n_nodes)),
        node_scores=rng.normal(size=(n_graphs, n_nodes)),
        num_nodes=num_nodes,
        edges_per_graph=edges_per_graph,
        sort_by_src=sort,
    ), edge_indices, edge_types


def test_bucket_picking():
    assert pick_edge_bucket(1) == 256
    assert pick_edge_bucket(256) == 256
    assert pick_edge_bucket(257) == 512
    assert pick_edge_bucket(10**9) == 16384


def test_roundtrip_edges():
    g, edge_indices, edge_types = _toy_batch(sort=False)
    for i, (ei, et) in enumerate(zip(edge_indices, edge_types)):
        e = ei.shape[1]
        assert g.edge_mask[i, :e].all() and not g.edge_mask[i, e:].any()
        np.testing.assert_array_equal(g.edge_src[i, :e], ei[0])
        np.testing.assert_array_equal(g.edge_dst[i, :e], ei[1])
        np.testing.assert_array_equal(g.edge_type[i, :e], et)


def test_sorted_by_src_preserves_multiset():
    g, edge_indices, edge_types = _toy_batch(sort=True)
    for i, (ei, et) in enumerate(zip(edge_indices, edge_types)):
        e = ei.shape[1]
        src = np.asarray(g.edge_src[i, :e])
        assert (np.diff(src) >= 0).all(), "edges must be sorted by src"
        got = sorted(zip(src, np.asarray(g.edge_dst[i, :e]), np.asarray(g.edge_type[i, :e])))
        want = sorted(zip(ei[0], ei[1], et))
        assert got == want


def test_flat_views_offset():
    g, _, _ = _toy_batch()
    import jax.numpy as jnp  # noqa: F401
    flat_src = np.asarray(g.flat_edge_src).reshape(g.n_graphs, g.edges_per_graph)
    for i in range(g.n_graphs):
        np.testing.assert_array_equal(
            flat_src[i], np.asarray(g.edge_src[i]) + i * g.nodes_per_graph)


def test_node_mask():
    g, _, _ = _toy_batch()
    nm = np.asarray(g.node_mask)
    for i in range(g.n_graphs):
        np.testing.assert_array_equal(nm[i], np.arange(g.nodes_per_graph) < g.num_nodes[i])


def test_truncation():
    with pytest.warns(UserWarning, match="truncates"):
        g, edge_indices, _ = _toy_batch(edges_per_graph=4, sort=False)
    assert g.edges_per_graph == 4
    for i, ei in enumerate(edge_indices):
        assert int(g.edge_mask[i].sum()) == min(ei.shape[1], 4)


def test_no_truncation_warning_when_budget_fits(recwarn):
    _toy_batch(edges_per_graph=16, sort=False)
    assert not [w for w in recwarn if "truncates" in str(w.message)]


def test_pytree_flattens():
    import jax
    g, _, _ = _toy_batch()
    leaves = jax.tree.leaves(g)
    assert len(leaves) == 8


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
