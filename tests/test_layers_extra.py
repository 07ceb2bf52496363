"""Tests for the extended ops library (the reference's full layer inventory).

Includes a port of the reference's own run_test assertions
(utils/layers.py:610-641): BilinearAttentionLayer backward through the mask,
DiffTopK straight-through gradient x.grad == r*2."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qagnn_tpu.models.layers import (
    BilinearAttentionLayer,
    TypedLinear,
    TypedMultiheadAttPoolLayer,
    diff_topk,
    matrix_attention,
)


def test_bilinear_attention_backward_through_mask():
    rng = np.random.default_rng(0)
    layer = BilinearAttentionLayer(query_dim=10, value_dim=7)
    q = jnp.asarray(rng.standard_normal((4, 10)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 5, 7)), jnp.float32)
    m = jnp.asarray((rng.random((4, 5)) > 0.3), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), q, v, m)

    pooled, attn = layer.apply(params, q, v, m)
    assert pooled.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(attn.sum(1)), 1.0, rtol=1e-5)
    # masked positions carry zero attention
    assert float(jnp.abs(attn * (1 - m)).sum()) < 1e-6

    grads = jax.grad(lambda p: jnp.sum(
        layer.apply(p, q, v, m)[0] ** 2))(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_diff_topk_straight_through_gradient():
    # reference utils/layers.py:621-628: loss = sum((x*mask)^2)... their test
    # uses n = DiffTopK(x, 2); loss = n.sum(); grad == ones. Check both the
    # mask forward and the straight-through backward.
    x = jnp.asarray([[3.0, 1.0, 2.0], [0.5, 9.0, -1.0]])
    mask = diff_topk(x, 2)
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[1, 0, 1], [1, 1, 0]])
    g = jax.grad(lambda x: jnp.sum(diff_topk(x, 2) * 2))(x)
    np.testing.assert_array_equal(np.asarray(g), np.full((2, 3), 2.0))


def test_typed_linear_selects_per_type():
    rng = np.random.default_rng(1)
    layer = TypedLinear(in_features=6, out_features=4, n_type=3)
    x = jnp.asarray(rng.standard_normal((5, 6)), jnp.float32)
    tid = jnp.asarray([0, 1, 2, 1, 0])
    params = layer.init(jax.random.PRNGKey(0), x, tid)
    y = layer.apply(params, x, tid)
    assert y.shape == (5, 4)
    # same input, same type -> same output; different type -> different
    x2 = jnp.broadcast_to(x[0], x.shape)
    y2 = layer.apply(params, x2, tid)
    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(y2[4]),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(y2[0]), np.asarray(y2[1]))


def test_typed_multihead_att_pool_shapes():
    rng = np.random.default_rng(2)
    layer = TypedMultiheadAttPoolLayer(n_head=2, d_q_original=12,
                                       d_k_original=8, n_type=3)
    q = jnp.asarray(rng.standard_normal((3, 12)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 6, 8)), jnp.float32)
    tid = jnp.asarray(rng.integers(0, 3, (3, 6)))
    mask = jnp.zeros((3, 6), bool).at[:, 4:].set(True)
    params = layer.init(jax.random.PRNGKey(0), q, k, mask, tid)
    out, attn = layer.apply(params, q, k, mask, tid)
    assert out.shape == (3, 8)
    assert float(attn.reshape(2, 3, 6)[:, :, 4:].sum()) == 0.0


def test_matrix_attention_all_pairs():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)
    got = matrix_attention(a, b)
    want = np.einsum("bld,bmd->blm", np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_triple_encoder_shapes():
    from qagnn_tpu.models.layers import TripleEncoder
    rng = np.random.default_rng(4)
    enc = TripleEncoder(emb_dim=8, hidden_dim=12)
    h = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), h, r, t)
    out = enc.apply(params, h, r, t)
    assert out.shape == (5, 12)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("num_layers,layer_norm", [(0, False), (1, True),
                                                   (2, False), (2, True)])
def test_mlp_fc_stack_matches_reference_torch(num_layers, layer_norm):
    """GOLDEN: MLP layer ordering (Linear -> Dropout -> [LN] -> act) vs the
    reference's torch MLP (utils/layers.py:47-87), incl. the n_fc_layer=0
    single-Linear case used by the final scorer
    (reference modeling/modeling_qagnn.py:122)."""
    import sys

    import numpy as np
    import torch

    from qagnn_tpu.models.layers import MLP

    sys.path.insert(0, "/root/reference")
    try:
        from utils.layers import MLP as RefMLP
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)
    ref = RefMLP(input_size=12, hidden_size=9, output_size=5,
                 num_layers=num_layers, dropout=0.0, layer_norm=layer_norm)
    ref.eval()

    params = {}
    sd = ref.state_dict()
    for i in range(num_layers + 1):
        params[f"linear_{i}"] = {
            "kernel": jnp.asarray(sd[f"layers.{i}-Linear.weight"].numpy().T),
            "bias": jnp.asarray(sd[f"layers.{i}-Linear.bias"].numpy()),
        }
        if layer_norm and i < num_layers:
            params[f"layernorm_{i}"] = {
                "scale": jnp.asarray(sd[f"layers.{i}-LayerNorm.weight"].numpy()),
                "bias": jnp.asarray(sd[f"layers.{i}-LayerNorm.bias"].numpy()),
            }

    mine = MLP(input_size=12, hidden_size=9, output_size=5,
               num_layers=num_layers, dropout=0.0, layer_norm=layer_norm)
    x = np.random.default_rng(0).standard_normal((7, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = mine.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)
