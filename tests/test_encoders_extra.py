"""GPT / XLNet encoder parity vs torch transformers (randomly initialized
locally — no downloads), mirroring test_text_encoder.py's approach."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_gpt_matches_torch_reference():
    import torch
    from transformers import OpenAIGPTConfig, OpenAIGPTModel

    from qagnn_tpu.models.gpt_encoder import (
        GPTTextEncoder, convert_hf_gpt_params, gpt_config_from_hf)

    torch.manual_seed(0)
    hf_cfg = OpenAIGPTConfig(vocab_size=97, n_positions=40, n_embd=32,
                             n_layer=2, n_head=2)
    torch_model = OpenAIGPTModel(hf_cfg)
    torch_model.eval()

    cfg = gpt_config_from_hf(hf_cfg)
    params = convert_hf_gpt_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(0)
    B, L = 3, 12
    input_ids = rng.integers(5, 90, (B, L))
    cls_ids = rng.integers(1, L, (B,))

    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids), output_hidden_states=True)
    want_hidden = [h.numpy() for h in out.hidden_states]

    enc = GPTTextEncoder(cfg)
    pooled, all_hidden = enc.apply(
        {"params": params}, jnp.asarray(input_ids), jnp.asarray(cls_ids),
        layer_id=-1, return_all_hidden=True)

    assert len(all_hidden) == len(want_hidden)
    for i, (got, want) in enumerate(zip(all_hidden, want_hidden)):
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"layer {i}")
    # pooled = hidden[-1] gathered at cls positions
    # (reference modeling/modeling_encoder.py:131-133)
    want_pool = want_hidden[-1][np.arange(B), cls_ids]
    np.testing.assert_allclose(np.asarray(pooled), want_pool,
                               rtol=2e-4, atol=2e-5)


def test_gpt_layer_id_pooling():
    import torch
    from transformers import OpenAIGPTConfig, OpenAIGPTModel

    from qagnn_tpu.models.gpt_encoder import (
        GPTTextEncoder, convert_hf_gpt_params, gpt_config_from_hf)

    torch.manual_seed(1)
    hf_cfg = OpenAIGPTConfig(vocab_size=97, n_positions=40, n_embd=32,
                             n_layer=2, n_head=2)
    torch_model = OpenAIGPTModel(hf_cfg)
    torch_model.eval()
    cfg = gpt_config_from_hf(hf_cfg)
    params = convert_hf_gpt_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(2)
    input_ids = rng.integers(5, 90, (2, 9))
    cls_ids = np.array([8, 3])
    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids), output_hidden_states=True)
    enc = GPTTextEncoder(cfg)
    pooled = enc.apply({"params": params}, jnp.asarray(input_ids),
                       jnp.asarray(cls_ids), layer_id=1)
    want = out.hidden_states[1].numpy()[np.arange(2), cls_ids]
    np.testing.assert_allclose(np.asarray(pooled), want, rtol=2e-4, atol=2e-5)


def _xlnet_pair(seed=0):
    import torch
    from transformers import XLNetConfig as HFXLNetConfig
    from transformers import XLNetModel

    torch.manual_seed(seed)
    hf_cfg = HFXLNetConfig(vocab_size=97, d_model=32, n_layer=2, n_head=2,
                           d_inner=64, ff_activation="gelu", attn_type="bi",
                           bi_data=False, mem_len=None, clamp_len=-1,
                           use_mems_eval=False)
    model = XLNetModel(hf_cfg)
    model.eval()
    return hf_cfg, model


def test_xlnet_matches_torch_reference():
    import torch

    from qagnn_tpu.models.xlnet_encoder import (
        XLNetTextEncoder, convert_hf_xlnet_params, xlnet_config_from_hf)

    hf_cfg, torch_model = _xlnet_pair()
    cfg = xlnet_config_from_hf(hf_cfg)
    params = convert_hf_xlnet_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(0)
    B, L = 3, 10
    # XLNet statement layout: LEFT padded, CLS at the end
    attention_mask = np.ones((B, L), np.int64)
    attention_mask[0, :3] = 0
    attention_mask[2, :5] = 0
    input_ids = rng.integers(5, 90, (B, L)) * attention_mask
    token_type_ids = rng.integers(0, 2, (B, L))
    token_type_ids[:, -1] = 2 % 2  # arbitrary; segments only compared rel.
    token_type_ids = np.where(attention_mask > 0, token_type_ids, 4)

    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids),
                          attention_mask=torch.tensor(attention_mask),
                          token_type_ids=torch.tensor(token_type_ids),
                          use_mems=False, output_hidden_states=True)
    want_hidden = [h.numpy() for h in out.hidden_states]

    enc = XLNetTextEncoder(cfg)
    pooled, all_hidden = enc.apply(
        {"params": params}, jnp.asarray(input_ids),
        jnp.asarray(attention_mask), jnp.asarray(token_type_ids),
        layer_id=-1, return_all_hidden=True)

    assert len(all_hidden) == len(want_hidden)
    for i, (got, want) in enumerate(zip(all_hidden, want_hidden)):
        # only real tokens compared (padding positions may drift; downstream
        # consumes the last — always real — position)
        for b in range(3):
            real = attention_mask[b] > 0
            np.testing.assert_allclose(
                np.asarray(got)[b][real], want[b][real],
                rtol=3e-4, atol=3e-5, err_msg=f"layer {i} row {b}")
    # sent_vec = hidden[:, -1] (reference modeling/modeling_encoder.py:135-136)
    np.testing.assert_allclose(np.asarray(pooled), want_hidden[-1][:, -1],
                               rtol=3e-4, atol=3e-5)


def test_xlnet_no_token_types_matches():
    import torch

    from qagnn_tpu.models.xlnet_encoder import (
        XLNetTextEncoder, convert_hf_xlnet_params, xlnet_config_from_hf)

    hf_cfg, torch_model = _xlnet_pair(seed=3)
    cfg = xlnet_config_from_hf(hf_cfg)
    params = convert_hf_xlnet_params(dict(torch_model.state_dict()))

    rng = np.random.default_rng(1)
    input_ids = rng.integers(5, 90, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        out = torch_model(torch.tensor(input_ids),
                          attention_mask=torch.tensor(mask),
                          use_mems=False, output_hidden_states=True)
    enc = XLNetTextEncoder(cfg)
    pooled = enc.apply({"params": params}, jnp.asarray(input_ids),
                       jnp.asarray(mask), None)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.hidden_states[-1].numpy()[:, -1],
                               rtol=3e-4, atol=3e-5)
