"""Text-encoder parity vs torch transformers BertModel/RobertaModel
(randomly initialized locally — no downloads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qagnn_tpu.models.text_encoder import (
    TextEncoder,
    TextEncoderConfig,
    config_from_hf,
    convert_hf_encoder_params,
)


def _torch_models(kind):
    import torch
    torch.manual_seed(0)
    if kind == "bert":
        from transformers import BertConfig, BertModel
        cfg = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=40, type_vocab_size=2)
        model = BertModel(cfg)
    else:
        from transformers import RobertaConfig, RobertaModel
        cfg = RobertaConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            max_position_embeddings=42, type_vocab_size=1,
                            pad_token_id=1)
        model = RobertaModel(cfg)
    model.eval()
    return cfg, model


@pytest.mark.parametrize("kind", ["bert", "roberta"])
def test_encoder_matches_torch_reference(kind):
    import torch
    hf_cfg, torch_model = _torch_models(kind)
    cfg = config_from_hf(hf_cfg)
    params = convert_hf_encoder_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(0)
    B, L = 3, 10
    input_ids = rng.integers(5, 90, (B, L))
    attention_mask = np.ones((B, L), np.int64)
    attention_mask[0, 7:] = 0
    attention_mask[2, 4:] = 0
    if kind == "roberta":
        input_ids = np.where(attention_mask > 0, input_ids, 1)

    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids),
                          attention_mask=torch.tensor(attention_mask),
                          output_hidden_states=True)
    want_hidden = [h.numpy() for h in out.hidden_states]
    want_pooled = out.pooler_output.numpy()

    enc = TextEncoder(cfg)
    pooled, all_hidden = enc.apply(
        {"params": params}, jnp.asarray(input_ids),
        jnp.asarray(attention_mask), layer_id=-1, return_all_hidden=True)

    assert len(all_hidden) == len(want_hidden)
    for i, (got, want) in enumerate(zip(all_hidden, want_hidden)):
        # only real (unmasked) positions are compared; HF computes padded
        # positions too but downstream consumes only the CLS position
        for b in range(B):
            real = int(attention_mask[b].sum())
            np.testing.assert_allclose(
                np.asarray(got)[b, :real], want[b, :real],
                rtol=2e-4, atol=2e-5, err_msg=f"layer {i} row {b}")
    np.testing.assert_allclose(np.asarray(pooled), want_pooled,
                               rtol=2e-4, atol=2e-5)


def test_layer_id_selects_hidden_layer():
    import torch
    hf_cfg, torch_model = _torch_models("bert")
    cfg = config_from_hf(hf_cfg)
    params = convert_hf_encoder_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(1)
    input_ids = rng.integers(5, 90, (2, 8))
    mask = np.ones((2, 8), np.int64)

    enc = TextEncoder(cfg)
    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids),
                          attention_mask=torch.tensor(mask),
                          output_hidden_states=True)

    # layer_id=1 pools hidden_states[1] through the SAME pooler dense
    # (reference modeling/modeling_encoder.py:126,142)
    pooled1 = enc.apply({"params": params}, jnp.asarray(input_ids),
                        jnp.asarray(mask), layer_id=1)
    with torch.no_grad():
        want = torch_model.pooler(out.hidden_states[1]).numpy()
    np.testing.assert_allclose(np.asarray(pooled1), want, rtol=2e-4, atol=2e-5)


def test_albert_matches_torch_reference():
    """ALBERT parity: factorized embedding, shared block, raw-CLS pool
    (reference modeling/modeling_encoder.py:138-140 pools hidden[:, 0] with
    no pooler dense for the albert family)."""
    import torch
    from transformers import AlbertConfig, AlbertModel

    from qagnn_tpu.models.text_encoder import convert_hf_albert_params

    torch.manual_seed(0)
    hf_cfg = AlbertConfig(vocab_size=99, embedding_size=16, hidden_size=32,
                          num_hidden_layers=3, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=40,
                          type_vocab_size=2, hidden_act="gelu_new",
                          num_hidden_groups=1, inner_group_num=1,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch_model = AlbertModel(hf_cfg)
    torch_model.eval()

    cfg = config_from_hf(hf_cfg)
    assert cfg.share_layers and cfg.raw_cls_pool
    assert cfg.embedding_size == 16
    params = convert_hf_albert_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(0)
    B, L = 3, 10
    input_ids = rng.integers(5, 90, (B, L))
    attention_mask = np.ones((B, L), np.int64)
    attention_mask[1, 6:] = 0

    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids),
                          attention_mask=torch.tensor(attention_mask),
                          output_hidden_states=True)
    want_hidden = [h.numpy() for h in out.hidden_states]

    enc = TextEncoder(cfg)
    pooled, all_hidden = enc.apply(
        {"params": params}, jnp.asarray(input_ids),
        jnp.asarray(attention_mask), layer_id=-1, return_all_hidden=True)

    # HF AlbertTransformer records hidden_states[0] AFTER the factorized
    # embedding projection, same as this encoder — compare every layer
    assert len(all_hidden) == len(want_hidden)
    for i in range(len(want_hidden)):
        for b in range(B):
            real = int(attention_mask[b].sum())
            np.testing.assert_allclose(
                np.asarray(all_hidden[i])[b, :real], want_hidden[i][b, :real],
                rtol=2e-4, atol=2e-5, err_msg=f"layer {i} row {b}")
    np.testing.assert_allclose(np.asarray(pooled),
                               want_hidden[-1][:, 0], rtol=2e-4, atol=2e-5)


def test_albert_converter_rejects_multigroup():
    import pytest as _pytest

    from qagnn_tpu.models.text_encoder import convert_hf_albert_params

    fake = {"encoder.albert_layer_groups.1.albert_layers.0.ffn.weight": None}
    with _pytest.raises(AssertionError):
        convert_hf_albert_params(fake)


def test_tiny_config_runs_and_is_finite():
    cfg = TextEncoderConfig.tiny()
    enc = TextEncoder(cfg)
    ids = jnp.ones((2, 12), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    pooled = enc.apply(params, ids, mask)
    assert pooled.shape == (2, cfg.hidden_size)
    assert bool(jnp.isfinite(pooled).all())


def test_lstm_encoder_shapes_and_masking():
    """Port of the reference's LSTM smoke test
    (modeling/modeling_encoder.py:146-154) plus a masking check."""
    from qagnn_tpu.models.lstm_encoder import LSTMTextEncoder

    enc = LSTMTextEncoder(vocab_size=100, emb_size=100, hidden_size=200,
                          output_size=200, num_layers=4)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, (6, 14)), jnp.int32)
    lengths = jnp.asarray(rng.integers(1, 14, (6,)), jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), ids, lengths)
    pooled, hidden = enc.apply(variables, ids, lengths)
    assert pooled.shape == (6, 200)
    assert len(hidden) == 5
    assert hidden[0].shape == (6, 14, 100)
    assert all(h.shape == (6, 14, 200) for h in hidden[1:])
    assert np.isfinite(np.asarray(pooled)).all()

    # masking: tokens beyond `lengths` must not affect the pooled output
    ids2 = ids.at[:, 12:].set(7)
    lengths_short = jnp.full((6,), 10, jnp.int32)
    p1 = enc.apply(variables, ids, lengths_short)[0]
    p2 = enc.apply(variables, ids2, lengths_short)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
