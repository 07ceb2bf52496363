"""Pallas fused GAT kernel vs the XLA backends (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qagnn_tpu.ops.gat_attention import relational_gat_attention_nodes
from qagnn_tpu.ops.pallas_gat import pallas_relational_gat

G, N, E, HD, HEADS = 3, 8, 16, 8, 2
DPH = HD // HEADS


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    nq, nk, nm = f(G, N, HD), f(G, N, HD), f(G, N, HD)
    ekb, emb = f(G, E, HD), f(G, E, HD)
    skb, smb = f(G, N, HD), f(G, N, HD)
    src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    mask = jnp.asarray(rng.random((G, E)) > 0.25, jnp.float32)
    return nq, nk, nm, ekb, emb, skb, smb, src, dst, mask


def _xla(inputs, backend):
    nq, nk, nm, ekb, emb, skb, smb, src, dst, mask = inputs

    def r(t):
        return t.reshape(t.shape[0], t.shape[1], HEADS, DPH)

    return relational_gat_attention_nodes(
        r(nq), r(nk), r(nm), r(ekb), r(emb), r(skb), r(smb),
        src, dst, mask > 0, backend=backend)


def test_fused_kernel_matches_xla(inputs):
    got = pallas_relational_gat(*inputs, HEADS, True)
    want = _xla(inputs, "scatter")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_kernel_all_edges_masked(inputs):
    nq, nk, nm, ekb, emb, skb, smb, src, dst, _ = inputs
    mask = jnp.zeros((G, E), jnp.float32)
    got = pallas_relational_gat(nq, nk, nm, ekb, emb, skb, smb,
                                src, dst, mask, HEADS, True)
    want = _xla((nq, nk, nm, ekb, emb, skb, smb, src, dst, mask), "scatter")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    assert np.isfinite(np.asarray(got)).all()


def test_fused_kernel_gradients(inputs):
    def loss_fused(args):
        return jnp.sum(pallas_relational_gat(*args, *inputs[7:],
                                             HEADS, True) ** 2)

    def loss_xla(args):
        full = args + inputs[7:]
        return jnp.sum(_xla(full, "scatter") ** 2)

    diff_args = inputs[:7]
    g1 = jax.grad(loss_fused)(diff_args)
    g2 = jax.grad(loss_xla)(diff_args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_fused_kernel_multi_tile(inputs, monkeypatch):
    """Force n_tiles > 1 so cross-tile accumulation (denominators, degree,
    aggregation, node-cotangent accumulators) is exercised. E=16, TILE_E=4
    -> 4 tiles per graph."""
    import qagnn_tpu.ops.pallas_gat as pg
    monkeypatch.setattr(pg, "TILE_E", 4)

    got = pallas_relational_gat(*inputs, HEADS, True)
    want = _xla(inputs, "scatter")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    def loss_fused(args):
        return jnp.sum(pallas_relational_gat(*args, *inputs[7:],
                                             HEADS, True) ** 2)

    def loss_xla(args):
        return jnp.sum(_xla(args + inputs[7:], "scatter") ** 2)

    diff_args = inputs[:7]
    g1 = jax.grad(loss_fused)(diff_args)
    g2 = jax.grad(loss_xla)(diff_args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_fused_kernel_bf16_gradient_drift(inputs):
    """Quantify the bf16 compute-dtype gradient drift vs the f32 scatter
    oracle (the TPU path runs the kernel in bf16; one-hots are exact in
    bf16 but value operands carry real mantissa — keep the drift bounded)."""
    cast = tuple(t.astype(jnp.bfloat16) for t in inputs[:7])

    def loss_bf16(args):
        return jnp.sum(pallas_relational_gat(*args, *inputs[7:],
                                             HEADS, True) ** 2)

    def loss_xla(args):
        return jnp.sum(_xla(args + inputs[7:], "scatter") ** 2)

    g1 = jax.grad(loss_bf16)(cast)
    g2 = jax.grad(loss_xla)(inputs[:7])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        assert rel < 0.05, f"bf16 gradient drift {rel:.4f} exceeds 5%"


def test_fused_kernel_gradients_all_edges_masked(inputs):
    """With every edge padded, edge-bias grads must be 0 and the self-loop
    grads must match the scatter oracle (denominator = e_self only)."""
    nq, nk, nm, ekb, emb, skb, smb, src, dst, _ = inputs
    mask = jnp.zeros((G, E), jnp.float32)

    def loss_fused(args):
        return jnp.sum(pallas_relational_gat(*args, src, dst, mask,
                                             HEADS, True) ** 2)

    def loss_xla(args):
        return jnp.sum(_xla(args + (src, dst, mask), "scatter") ** 2)

    diff_args = (nq, nk, nm, ekb, emb, skb, smb)
    g1 = jax.grad(loss_fused)(diff_args)
    g2 = jax.grad(loss_xla)(diff_args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
    # edge-bias cotangents are exactly zero for padded edges
    np.testing.assert_array_equal(np.asarray(g1[3]), 0.0)
    np.testing.assert_array_equal(np.asarray(g1[4]), 0.0)
