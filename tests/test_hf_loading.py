"""Pretrained-encoder loading into the driver (VERDICT r1 item 1).

Proves the reference's pretrained-LM start (reference
modeling/modeling_encoder.py:102-108, qagnn.py:124-125) is reproduced:
a cli-built model merged with --encoder_load weights produces the SAME
pooled sentence vectors as the torch model, at step 0, through the real
driver code path (load_pretrained_encoder -> init -> _merge_pretrained).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tiny_bert(tmp_path):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(7)
    cfg = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=40, type_vocab_size=2)
    model = BertModel(cfg)
    model.eval()
    ckpt_dir = tmp_path / "hf_ckpt"
    model.save_pretrained(str(ckpt_dir))
    return model, str(ckpt_dir)


def test_load_encoder_checkpoint_dir_matches_torch(tmp_path):
    import torch

    from qagnn_tpu.models.hf_loading import load_encoder_checkpoint
    from qagnn_tpu.models.text_encoder import TextEncoder

    torch_model, ckpt_dir = _tiny_bert(tmp_path)
    cfg, params = load_encoder_checkpoint(ckpt_dir)
    assert cfg.hidden_size == 32 and cfg.num_layers == 2

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 90, (3, 9))
    mask = np.ones((3, 9), np.int64)
    mask[1, 5:] = 0

    with torch.no_grad():
        want = torch_model(torch.tensor(ids),
                           attention_mask=torch.tensor(mask)).pooler_output

    got = TextEncoder(cfg).apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_strip_hf_prefixes_unwraps_task_models(tmp_path):
    import torch
    from transformers import BertConfig, BertForMaskedLM

    from qagnn_tpu.models.hf_loading import strip_hf_prefixes

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=20)
    sd = strip_hf_prefixes(dict(BertForMaskedLM(cfg).state_dict()))
    assert "embeddings.word_embeddings.weight" in sd
    assert not any(k.startswith(("cls.", "bert.")) for k in sd)


def test_missing_pooler_keeps_initialized_pooler(tmp_path):
    """MLM checkpoints (hub roberta-large) ship no pooler; conversion must
    leave the pooler key absent so the init value survives the merge."""
    import torch
    from transformers import BertConfig, BertModel

    from qagnn_tpu.models.text_encoder import convert_hf_encoder_params

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=20)
    sd = dict(BertModel(cfg).state_dict())
    sd = {k: v for k, v in sd.items() if not k.startswith("pooler.")}
    params = convert_hf_encoder_params(sd)
    assert "pooler" not in params
    assert "layer_0" in params


def test_driver_step0_sent_vecs_match_torch(tmp_path):
    """The full driver path: TrainConfig(--encoder_load) ->
    load_pretrained_encoder -> model.init -> _merge_pretrained -> forward.
    Step-0 sent_vecs must equal the torch model's pooled output."""
    import torch

    from qagnn_tpu.cli import load_pretrained_encoder
    from qagnn_tpu.models.qagnn import LMQAGNN
    from qagnn_tpu.models.text_encoder import TextEncoder
    from qagnn_tpu.train.step import _merge_pretrained
    from qagnn_tpu.utils.config import TrainConfig

    torch_model, ckpt_dir = _tiny_bert(tmp_path)
    cfg = TrainConfig(encoder="bert-tiny-test", encoder_load=ckpt_dir)
    enc_cfg, pretrained = load_pretrained_encoder(cfg)
    assert pretrained is not None

    model = LMQAGNN(
        encoder=TextEncoder(enc_cfg), sent_dim=enc_cfg.hidden_size,
        k=1, n_ntype=4, n_etype=10, n_concept=30, concept_dim=8,
        concept_in_dim=12, n_attention_head=2, fc_dim=8, n_fc_layer=0)

    rng = np.random.default_rng(0)
    bs, nc, L, N, E = 2, 2, 9, 6, 12
    lm_inputs = {
        "input_ids": jnp.asarray(rng.integers(5, 90, (bs, nc, L)), jnp.int32),
        "attention_mask": jnp.ones((bs, nc, L), jnp.int32),
        "token_type_ids": jnp.zeros((bs, nc, L), jnp.int32),
    }
    from qagnn_tpu.graph.container import BatchedGraphs
    graph = BatchedGraphs(
        concept_ids=jnp.asarray(rng.integers(1, 30, (bs * nc, N)), jnp.int32),
        node_types=jnp.asarray(rng.integers(0, 3, (bs * nc, N)), jnp.int32)
                   .at[:, 0].set(3),
        node_scores=jnp.asarray(rng.standard_normal((bs * nc, N)), jnp.float32),
        num_nodes=jnp.full((bs * nc,), N, jnp.int32),
        edge_src=jnp.asarray(rng.integers(0, N, (bs * nc, E)), jnp.int32),
        edge_dst=jnp.asarray(rng.integers(0, N, (bs * nc, E)), jnp.int32),
        edge_type=jnp.asarray(rng.integers(0, 10, (bs * nc, E)), jnp.int32),
        edge_mask=jnp.ones((bs * nc, E), bool),
    )

    variables = model.init(jax.random.PRNGKey(0), lm_inputs, graph)
    params = _merge_pretrained(variables["params"], {"encoder": pretrained})

    # encoder-only forward with the merged weights
    flat_ids = np.asarray(lm_inputs["input_ids"]).reshape(bs * nc, L)
    flat_mask = np.asarray(lm_inputs["attention_mask"]).reshape(bs * nc, L)
    got = TextEncoder(enc_cfg).apply(
        {"params": params["encoder"]}, jnp.asarray(flat_ids),
        jnp.asarray(flat_mask))
    with torch.no_grad():
        want = torch_model(torch.tensor(flat_ids, dtype=torch.long),
                           attention_mask=torch.tensor(flat_mask,
                                                       dtype=torch.long)
                           ).pooler_output
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)

    # and the assembled model runs with the merged params
    logits = model.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         lm_inputs, graph)
    assert logits.shape == (bs, nc)
    assert np.isfinite(np.asarray(logits)).all()
