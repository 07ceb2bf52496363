"""Pallas fused GAT kernel vs the XLA backends (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qagnn_tpu.ops.gat_attention import relational_gat_attention_nodes
from qagnn_tpu.ops.pallas_gat import (
    pallas_relational_gat,
    pallas_relational_gat_projected,
)

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


@pytest.fixture(scope="module")
def proj_inputs(inputs):
    """Inputs for the projected variant: shared edge embedding + the key_e /
    msg_e projection parameters applied in-kernel."""
    rng = np.random.default_rng(7)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    nq, nk, nm = inputs[0], inputs[1], inputs[2]
    D_IN = 8
    edge_emb = f(G, E, D_IN)
    self_emb = f(G, N, D_IN)
    w_ke, b_ke = f(D_IN, HD), f(HD)
    w_me, b_me = f(D_IN, HD), f(HD)
    return (nq, nk, nm, edge_emb, self_emb, w_ke, b_ke, w_me, b_me)


def _proj_oracle(proj_inputs, tail):
    """Scatter-backend oracle with the projections done in plain XLA."""
    nq, nk, nm, edge_emb, self_emb, w_ke, b_ke, w_me, b_me = proj_inputs
    src, dst, mask = tail
    ekb = edge_emb @ w_ke + b_ke
    emb = edge_emb @ w_me + b_me
    skb = self_emb @ w_ke + b_ke
    smb = self_emb @ w_me + b_me

    def r(t):
        return t.reshape(t.shape[0], t.shape[1], HEADS, DPH)

    return relational_gat_attention_nodes(
        r(nq), r(nk), r(nm), r(ekb), r(emb), r(skb), r(smb),
        src, dst, mask > 0, backend="scatter")


def _proj_call(proj_inputs, tail):
    nq, nk, nm, edge_emb, self_emb, w_ke, b_ke, w_me, b_me = proj_inputs
    src, dst, mask = tail
    skb = self_emb @ w_ke + b_ke
    smb = self_emb @ w_me + b_me
    # the fused op takes the edge embedding transposed: (G, D, E)
    return pallas_relational_gat_projected(
        nq, nk, nm, jnp.swapaxes(edge_emb, 1, 2), w_ke, b_ke, w_me, b_me,
        skb, smb, src, dst, mask, HEADS, True)


def test_projected_kernel_matches_oracle(inputs, proj_inputs):
    tail = inputs[7:]
    got = _proj_call(proj_inputs, tail)
    want = _proj_oracle(proj_inputs, tail)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_projected_kernel_gradients(inputs, proj_inputs):
    """All cotangents: node projections, edge_emb, W/b of both in-kernel
    projections (grid-accumulated), self biases via the dual-use params."""
    tail = inputs[7:]

    def loss_fused(args):
        return jnp.sum(_proj_call(args, tail) ** 2)

    def loss_oracle(args):
        return jnp.sum(_proj_oracle(args, tail) ** 2)

    g1 = jax.grad(loss_fused)(proj_inputs)
    g2 = jax.grad(loss_oracle)(proj_inputs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_projected_kernel_multi_tile(inputs, proj_inputs, monkeypatch):
    import qagnn_tpu.ops.pallas_gat as pg
    monkeypatch.setattr(pg, "TILE_E", 4)
    tail = inputs[7:]

    got = _proj_call(proj_inputs, tail)
    want = _proj_oracle(proj_inputs, tail)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss_fused(args):
        return jnp.sum(_proj_call(args, tail) ** 2)

    def loss_oracle(args):
        return jnp.sum(_proj_oracle(args, tail) ** 2)

    g1 = jax.grad(loss_fused)(proj_inputs)
    g2 = jax.grad(loss_oracle)(proj_inputs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


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


def test_fused_kernel_ragged_edge_count(monkeypatch):
    """E not divisible by the tile: the dispatch pads with masked slots;
    values and gradients must still match the scatter oracle."""
    import qagnn_tpu.ops.pallas_gat as pg
    monkeypatch.setattr(pg, "TILE_E", 8)

    rng = np.random.default_rng(3)
    G_, N_, E_, HD_ = 2, 8, 13, 8   # 13 % 8 != 0 -> padded to 16
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    nq, nk, nm = f(G_, N_, HD_), f(G_, N_, HD_), f(G_, N_, HD_)
    ekb, emb = f(G_, E_, HD_), f(G_, E_, HD_)
    skb, smb = f(G_, N_, HD_), f(G_, N_, HD_)
    src = jnp.asarray(rng.integers(0, N_, (G_, E_)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N_, (G_, E_)), jnp.int32)
    mask = jnp.asarray(rng.random((G_, E_)) > 0.25, bool)

    def r(t):
        return t.reshape(t.shape[0], t.shape[1], HEADS, HD_ // HEADS)

    def run(backend, args):
        nq, nk, nm, ekb, emb, skb, smb = args
        return relational_gat_attention_nodes(
            r(nq), r(nk), r(nm), r(ekb), r(emb), r(skb), r(smb),
            src, dst, mask, backend=backend)

    diff = (nq, nk, nm, ekb, emb, skb, smb)
    got = run("pallas", diff)
    want = run("scatter", diff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    g1 = jax.grad(lambda a: jnp.sum(run("pallas", a) ** 2))(diff)
    g2 = jax.grad(lambda a: jnp.sum(run("scatter", a) ** 2))(diff)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
