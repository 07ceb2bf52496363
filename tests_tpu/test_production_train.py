"""TPU-gated: the FULL production stack trains correctly on the chip.

Closes the gap between "parity proxies pass on CPU" and "the production
configuration actually learns on real hardware": cli.train drives the
fused Pallas kernels (bf16, hardware-RNG dropout, radam, freeze schedule)
at the production GNN width (k=5, gnn_dim=200, 200-node graphs, 38
relations) with a real --encoder_load checkpoint, and must overfit a
4-question synthetic dataset to dev_acc 1.0 — the dress rehearsal's
step-0 CPU checks, end-to-end on chip (reference analog: a full training
run, reference qagnn.py:104-340).

Run: python -m pytest tests_tpu/ -q   (skips off-TPU; first run pays a
cold Mosaic compile for these shapes, minutes over the tunnel)
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="production-stack chip training needs real TPU hardware")


def test_production_stack_overfits_on_chip(tmp_path):
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/qagnn_tpu_jax_cache")
    from qagnn_tpu.data.synthetic import (
        write_synthetic_dataset, write_tiny_bert_checkpoint)
    from qagnn_tpu.utils.config import TrainConfig
    import qagnn_tpu.cli as cli

    droot = str(tmp_path / "data")
    emb_path = write_synthetic_dataset(droot, n_questions=4,
                                       dev_equals_train=True)
    # a real HF save_pretrained checkpoint (pretrained-load path + its
    # tokenizer), mid-size so the encoder exercises real attention layers
    # without a 20-minute tunnel compile
    enc_dir = write_tiny_bert_checkpoint(
        str(tmp_path / "bert"), hidden_size=256, num_layers=4, num_heads=4)

    cfg = TrainConfig(
        dataset="csqa", encoder="bert-base-uncased", encoder_load=enc_dir,
        encoder_dtype="bfloat16", inhouse=False,
        save_dir=str(tmp_path / "out"), save_model=True, detail_batches=0,
        batch_size=4, mini_batch_size=4, eval_batch_size=4,
        n_epochs=150, max_epochs_before_stop=1000,
        max_seq_len=24,
        # PRODUCTION decoder config (reference run_qagnn__csqa.sh:19-23):
        # 200-node graphs, 38 relations, 5 GNN layers, dim 200 — the
        # fused pallas kernels + bf16 + rbg dropout path the bench runs
        max_node_num=200, num_relation=38, k=5, gnn_dim=200,
        fc_dim=200, att_head_num=2,
        dropouti=0.0, dropoutg=0.0, dropoutf=0.0,
        unfreeze_epoch=0, log_interval=50,
        decoder_lr=3e-3, encoder_lr=1e-4,
    )
    cfg.train_statements = f"{droot}/statement/train.statement.jsonl"
    cfg.dev_statements = f"{droot}/statement/dev.statement.jsonl"
    cfg.test_statements = f"{droot}/statement/test.statement.jsonl"
    cfg.train_adj = f"{droot}/graph/train.graph.adj.pk"
    cfg.dev_adj = f"{droot}/graph/dev.graph.adj.pk"
    cfg.test_adj = f"{droot}/graph/test.graph.adj.pk"
    cfg.ent_emb_paths = (emb_path,)

    result = cli.train(cfg)
    assert result["best_dev_acc"] == 1.0, (
        f"production stack failed to overfit 4 questions on chip: {result}")
    # the loss actually moved (a frozen/broken backward would sit still)
    losses = result["train_losses"]
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # checkpoint -> eval_detail round-trip ON CHIP (orbax restore of TPU
    # arrays + the driver's standalone eval path, reference
    # qagnn.py:343-430); tokenizer comes from the encoder_load dir
    import dataclasses
    import os as _os
    cfg_eval = dataclasses.replace(
        cfg, mode="eval_detail",
        load_model_path=_os.path.join(cfg.save_dir, "checkpoint"),
        save_dir=str(tmp_path / "out_eval"))
    _os.makedirs(cfg_eval.save_dir, exist_ok=True)
    r2 = cli.eval_detail(cfg_eval)
    assert r2["dev_acc"] == 1.0, r2


def test_roberta_base_driver_step_on_chip():
    """The roberta-base-shaped driver train step (the realistic-LM bench
    config) executes on chip for both freeze variants — the static-freeze
    compile (no encoder backward) and the full step."""
    import argparse

    import bench

    a = argparse.Namespace(**vars(bench.parse_args([])))
    a.mode = "driver"
    a.encoder = "roberta-base"
    a.iters = 5
    unfrozen, _ = bench.run_driver(a, None)
    a.frozen_encoder = True
    frozen, _ = bench.run_driver(a, None)
    assert unfrozen > 0 and frozen > 0
