"""End-to-end driver smoke: qagnn_tpu.cli.train() on a synthetic dataset with
the tiny encoder — exercises tokenization, graph loading, model init with
pretrained entity embeddings, the jitted train loop, eval, log.csv, early
stop plumbing."""

import json
import os
import pickle

import numpy as np
import pytest

from qagnn_tpu.utils.config import TrainConfig


from qagnn_tpu.data.synthetic import VOCAB
from qagnn_tpu.data.synthetic import write_synthetic_dataset as _write_dataset


def _tokenizer(tmp_path):
    from transformers import BertTokenizerFast
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(VOCAB))
    return BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)


def _fix_paths(cfg, root, emb_path):
    """resolved() re-formats paths with {dataset}; ours are absolute."""
    cfg.train_statements = f"{root}/statement/train.statement.jsonl"
    cfg.dev_statements = f"{root}/statement/dev.statement.jsonl"
    cfg.test_statements = f"{root}/statement/test.statement.jsonl"
    cfg.train_adj = f"{root}/graph/train.graph.adj.pk"
    cfg.dev_adj = f"{root}/graph/dev.graph.adj.pk"
    cfg.test_adj = f"{root}/graph/test.graph.adj.pk"
    cfg.ent_emb_paths = (emb_path,)
    return cfg


def test_cli_overfit_checkpoint_eval_detail_resume(tmp_path, monkeypatch):
    """Three driver guarantees the smoke test can't give:
    1. training LEARNS — a 4-question set is overfit to dev_acc 1.0
       (dev == train), so a zero-gradient train step would fail loudly;
    2. checkpoint -> eval_detail round-trip reproduces the saved accuracy
       (reference qagnn.py:343-430);
    3. --load_model_path warm-starts training from the saved step
       (reference qagnn.py:163-166)."""
    import dataclasses

    root = str(tmp_path / "data")
    emb_path = _write_dataset(root, dev_equals_train=True)
    tok = _tokenizer(tmp_path)

    import qagnn_tpu.cli as cli
    orig = cli.build_model_and_data
    monkeypatch.setattr(
        cli, "build_model_and_data",
        lambda cfg, tokenizer=None, gnn_mesh=None:
        orig(cfg, tokenizer=tok, gnn_mesh=gnn_mesh))

    cfg = _fix_paths(TrainConfig(
        dataset="csqa", encoder="tiny", inhouse=False,
        save_dir=str(tmp_path / "out"), save_model=True,
        n_epochs=170, batch_size=4, mini_batch_size=2, eval_batch_size=2,
        max_seq_len=16, max_node_num=8, num_relation=10,
        k=1, gnn_dim=8, fc_dim=8, att_head_num=2,
        dropouti=0.0, dropoutg=0.0, dropoutf=0.0,
        unfreeze_epoch=0, log_interval=1000, max_epochs_before_stop=1000,
        decoder_lr=3e-3, encoder_lr=1e-3,
    ).resolved(), root, emb_path)

    result = cli.train(cfg)
    assert result["best_dev_acc"] == 1.0, (
        f"failed to overfit 4 questions: {result}")

    # --- checkpoint -> eval_detail round-trip -----------------------------
    ckpt = os.path.join(cfg.save_dir, "checkpoint")
    cfg_eval = dataclasses.replace(cfg, mode="eval_detail",
                                   load_model_path=ckpt,
                                   save_dir=str(tmp_path / "out_eval"))
    os.makedirs(cfg_eval.save_dir, exist_ok=True)
    r2 = cli.eval_detail(cfg_eval)
    assert r2["dev_acc"] == result["best_dev_acc"]
    assert os.path.exists(os.path.join(cfg_eval.save_dir,
                                       "predictions_test.csv"))
    # detail-mode analysis dump (reference modeling_qagnn.py:236-241):
    # pooler attention + per-layer GNN edge/self alphas + graph tensors
    detail = np.load(os.path.join(cfg_eval.save_dir, "test_detail.0.npz"),
                     allow_pickle=False)
    k, g = cfg.k, cfg_eval.eval_batch_size * 2   # 2 choices per question
    assert detail["gnn_edge_alpha"].shape[0] == k
    assert detail["gnn_edge_alpha"].shape[1] == g
    assert detail["gnn_self_alpha"].shape[:2] == (k, g)
    assert detail["pool_attn"].shape[-1] == cfg.max_node_num
    assert detail["logits"].shape == (cfg_eval.eval_batch_size, 2)
    assert np.isfinite(detail["gnn_edge_alpha"]).all()
    assert (detail["gnn_edge_alpha"] >= 0).all()

    # --- warm-start/resume -------------------------------------------------
    cfg_resume = dataclasses.replace(cfg, load_model_path=ckpt,
                                     save_dir=str(tmp_path / "out_resume"),
                                     n_epochs=1, save_model=False)
    r3 = cli.train(cfg_resume)
    # restored params were already at dev_acc 1.0; one more epoch keeps it
    assert r3["best_dev_acc"] == 1.0


def test_cli_train_end_to_end(tmp_path, monkeypatch):
    root = str(tmp_path / "data")
    emb_path = _write_dataset(root)

    from transformers import BertTokenizerFast
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)

    # route the tiny encoder + our tokenizer through the driver
    import qagnn_tpu.cli as cli
    orig = cli.build_model_and_data
    monkeypatch.setattr(
        cli, "build_model_and_data",
        lambda cfg, tokenizer=None, gnn_mesh=None:
        orig(cfg, tokenizer=tok, gnn_mesh=gnn_mesh))

    cfg = TrainConfig(
        dataset="csqa", encoder="tiny", inhouse=False,
        train_statements=f"{root}/statement/train.statement.jsonl",
        dev_statements=f"{root}/statement/dev.statement.jsonl",
        test_statements=f"{root}/statement/test.statement.jsonl",
        train_adj=f"{root}/graph/train.graph.adj.pk",
        dev_adj=f"{root}/graph/dev.graph.adj.pk",
        test_adj=f"{root}/graph/test.graph.adj.pk",
        ent_emb_paths=(emb_path,),
        save_dir=str(tmp_path / "out"), save_model=False,
        n_epochs=2, batch_size=2, mini_batch_size=1, eval_batch_size=2,
        max_seq_len=16, max_node_num=8, num_relation=10,
        k=1, gnn_dim=8, fc_dim=8, att_head_num=2,
        unfreeze_epoch=1, log_interval=1,
    ).resolved()
    # resolved() re-formats paths with {dataset}; ours are absolute already
    cfg.train_statements = f"{root}/statement/train.statement.jsonl"
    cfg.dev_statements = f"{root}/statement/dev.statement.jsonl"
    cfg.test_statements = f"{root}/statement/test.statement.jsonl"
    cfg.train_adj = f"{root}/graph/train.graph.adj.pk"
    cfg.dev_adj = f"{root}/graph/dev.graph.adj.pk"
    cfg.test_adj = f"{root}/graph/test.graph.adj.pk"
    cfg.ent_emb_paths = (emb_path,)

    result = cli.train(cfg)
    assert 0.0 <= result["best_dev_acc"] <= 1.0

    log = (tmp_path / "out" / "log.csv").read_text().strip().splitlines()
    assert log[0] == "step,dev_acc,test_acc"
    assert len(log) == 3  # header + 2 epochs
    assert (tmp_path / "out" / "config.json").exists()


@pytest.mark.parametrize("encoder", ["tiny-gpt", "tiny-xlnet"])
def test_cli_train_gpt_xlnet_encoders(tmp_path, monkeypatch, encoder):
    """Driver smoke with the GPT and XLNet encoder families: their statement
    tensorization produces family-specific lm_inputs (cls_token_ids gather /
    left-pad CLS-at-end) that flow through the same jitted train loop."""
    root = str(tmp_path / "data")
    emb_path = _write_dataset(root)
    tok = _tokenizer(tmp_path)

    import qagnn_tpu.cli as cli
    orig = cli.build_model_and_data
    monkeypatch.setattr(
        cli, "build_model_and_data",
        lambda cfg, tokenizer=None, gnn_mesh=None:
        orig(cfg, tokenizer=tok, gnn_mesh=gnn_mesh))

    cfg = _fix_paths(TrainConfig(
        dataset="csqa", encoder=encoder, inhouse=False,
        save_dir=str(tmp_path / "out"), save_model=False,
        n_epochs=1, batch_size=2, mini_batch_size=1, eval_batch_size=2,
        max_seq_len=16, max_node_num=8, num_relation=10,
        k=1, gnn_dim=8, fc_dim=8, att_head_num=2,
        unfreeze_epoch=0, log_interval=1000,
    ).resolved(), root, emb_path)

    result = cli.train(cfg)
    assert 0.0 <= result["best_dev_acc"] <= 1.0


def test_cli_train_lstm_encoder(tmp_path):
    """Driver e2e with --encoder lstm: word-vocab build -> WordTokenizer ->
    (input_ids, lengths) tensorization -> LSTMTextEncoder, no monkeypatching
    (the driver constructs the tokenizer from --lstm_vocab itself). The
    reference never finished this path (utils/data_utils.py:478-480)."""
    from qagnn_tpu.data.word_tokenizer import make_word_vocab

    root = str(tmp_path / "data")
    emb_path = _write_dataset(root)
    vocab_path = str(tmp_path / "vocab.json")
    make_word_vocab([f"{root}/statement/train.statement.jsonl"],
                    vocab_path, freq_cutoff=1)

    import qagnn_tpu.cli as cli
    cfg = _fix_paths(TrainConfig(
        dataset="csqa", encoder="tiny-lstm", lstm_vocab=vocab_path,
        inhouse=False,
        save_dir=str(tmp_path / "out"), save_model=False,
        n_epochs=1, batch_size=2, mini_batch_size=1, eval_batch_size=2,
        max_seq_len=16, max_node_num=8, num_relation=10,
        k=1, gnn_dim=8, fc_dim=8, att_head_num=2,
        unfreeze_epoch=0, log_interval=1000,
    ).resolved(), root, emb_path)

    result = cli.train(cfg)
    assert 0.0 <= result["best_dev_acc"] <= 1.0


def test_cli_train_mesh_loss_parity(tmp_path, monkeypatch):
    """The driver trains IDENTICALLY on 1 device and on an 8-device
    (data=4, model=2) mesh: same per-step losses (up to cross-device
    reduction reassociation) and same dev accuracy. This exercises the
    driver's own mesh path — make_mesh/shard_batch/param_shardings inside
    cli.train — not a bespoke test harness."""
    import dataclasses

    root = str(tmp_path / "data")
    emb_path = _write_dataset(root)
    tok = _tokenizer(tmp_path)

    import qagnn_tpu.cli as cli
    orig = cli.build_model_and_data
    monkeypatch.setattr(
        cli, "build_model_and_data",
        lambda cfg, tokenizer=None, gnn_mesh=None:
        orig(cfg, tokenizer=tok, gnn_mesh=gnn_mesh))

    base = _fix_paths(TrainConfig(
        dataset="csqa", encoder="tiny", inhouse=False,
        save_dir=str(tmp_path / "out1"), save_model=False,
        n_epochs=2, batch_size=4, mini_batch_size=2, eval_batch_size=4,
        max_seq_len=16, max_node_num=8, num_relation=10,
        k=1, gnn_dim=8, fc_dim=8, att_head_num=2,
        unfreeze_epoch=0, log_interval=1000,
        mesh_data=1, mesh_model=1,
    ).resolved(), root, emb_path)

    r1 = cli.train(base)

    cfg8 = dataclasses.replace(base, mesh_data=4, mesh_model=2,
                               save_dir=str(tmp_path / "out8"))
    r8 = cli.train(cfg8)

    assert r1["train_losses"] and len(r1["train_losses"]) == \
        len(r8["train_losses"])
    np.testing.assert_allclose(r1["train_losses"], r8["train_losses"],
                               rtol=2e-4, atol=2e-5)
    assert r1["best_dev_acc"] == r8["best_dev_acc"]


def test_cli_train_mesh_pallas_loss_parity(tmp_path, monkeypatch):
    """mesh_model>1 with the PRODUCTION pallas backend: the driver routes
    GATConvE through the edge-partitioned shard_map form
    (parallel/edge_shard_pallas — no silent downgrade to a slower XLA
    backend), and the per-step losses match the single-device fused run
    up to collective reassociation + the sharded path's XLA edge encoder
    (same math, different BN-moment association)."""
    import dataclasses

    root = str(tmp_path / "data")
    emb_path = _write_dataset(root)
    tok = _tokenizer(tmp_path)

    import qagnn_tpu.cli as cli
    orig = cli.build_model_and_data
    seen_meshes = []

    def wrapped(cfg, tokenizer=None, gnn_mesh=None):
        seen_meshes.append(gnn_mesh)
        return orig(cfg, tokenizer=tok, gnn_mesh=gnn_mesh)

    monkeypatch.setattr(cli, "build_model_and_data", wrapped)

    base = _fix_paths(TrainConfig(
        dataset="csqa", encoder="tiny", inhouse=False,
        save_dir=str(tmp_path / "out1"), save_model=False,
        n_epochs=1, batch_size=4, mini_batch_size=2, eval_batch_size=4,
        max_seq_len=16, max_node_num=8, num_relation=10,
        k=2, gnn_dim=8, fc_dim=8, att_head_num=2,
        unfreeze_epoch=0, log_interval=1000,
        mesh_data=1, mesh_model=1, gnn_backend="pallas",
    ).resolved(), root, emb_path)

    r1 = cli.train(base)
    assert seen_meshes[-1] is None   # single device: no model-axis mesh

    cfg8 = dataclasses.replace(base, mesh_data=4, mesh_model=2,
                               save_dir=str(tmp_path / "out8"))
    r8 = cli.train(cfg8)
    assert seen_meshes[-1] is not None, (
        "driver failed to hand the model the mesh for edge partitioning")
    assert seen_meshes[-1].shape["model"] == 2

    assert r1["train_losses"] and len(r1["train_losses"]) == \
        len(r8["train_losses"])
    np.testing.assert_allclose(r1["train_losses"], r8["train_losses"],
                               rtol=5e-4, atol=5e-5)
