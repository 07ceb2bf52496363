"""Training / evaluation driver.

Replaces reference qagnn.py:41-433 (main/train/eval_detail): epoch loop with
encoder freeze schedule, per-epoch dev/test accuracy, best-dev checkpointing,
early stopping, log.csv and per-epoch test-prediction CSVs — but with the
whole hot path inside one jitted TPU program and orbax checkpoints carrying
params + optimizer state + step (the reference saves weights only,
reference qagnn.py:317-333).

Run:  python -m qagnn_tpu.cli --dataset csqa --encoder roberta-large ...
"""

from __future__ import annotations

import csv
import os
import sys
import time

import numpy as np

from qagnn_tpu.utils.config import TrainConfig, config_from_argv


def build_model_and_data(cfg: TrainConfig, tokenizer=None, gnn_mesh=None):
    """Construct dataloader + model from a resolved TrainConfig.

    gnn_mesh: a (data, model) Mesh with model axis > 1 routes the fused
    Pallas kernels through their edge-partitioned shard_map form
    (qagnn_tpu/parallel/edge_shard_pallas) instead of downgrading to a
    slower XLA backend."""
    import jax.numpy as jnp

    from qagnn_tpu.data.loader import QAGNNDataLoader
    from qagnn_tpu.models.qagnn import LMQAGNN

    if tokenizer is None and cfg.lstm_vocab and "lstm" in cfg.encoder:
        from qagnn_tpu.data.word_tokenizer import WordTokenizer
        tokenizer = WordTokenizer(cfg.lstm_vocab)
    if tokenizer is None and cfg.encoder_load \
            and os.path.isdir(cfg.encoder_load):
        # offline hosts: an HF save_pretrained checkpoint dir ships its
        # tokenizer — prefer it over a hub lookup by encoder name
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(cfg.encoder_load)
        except Exception:
            tokenizer = None

    dataset = QAGNNDataLoader(
        train_statements=cfg.train_statements, train_adj=cfg.train_adj,
        dev_statements=cfg.dev_statements, dev_adj=cfg.dev_adj,
        test_statements=cfg.test_statements, test_adj=cfg.test_adj,
        model_name=cfg.encoder, max_node_num=cfg.max_node_num,
        max_seq_len=cfg.max_seq_len, batch_size=cfg.batch_size,
        eval_batch_size=cfg.eval_batch_size, is_inhouse=cfg.inhouse,
        inhouse_train_qids_path=cfg.inhouse_train_qids,
        subsample=cfg.subsample, seed=cfg.seed, tokenizer=tokenizer)

    # entity embeddings (reference qagnn.py:124-125)
    cp_embs = [np.load(p) for p in cfg.ent_emb_paths]
    cp_emb = np.concatenate(cp_embs, axis=1).astype(np.float32)
    n_concept, concept_in_dim = cp_emb.shape

    enc_cfg, pretrained_encoder = load_pretrained_encoder(cfg)
    encoder_module = make_encoder(enc_cfg)
    model = LMQAGNN(
        encoder=encoder_module, sent_dim=enc_cfg.hidden_size,
        k=cfg.k, n_ntype=4, n_etype=cfg.num_relation,
        n_concept=n_concept, concept_dim=cfg.gnn_dim,
        concept_in_dim=concept_in_dim, n_attention_head=cfg.att_head_num,
        fc_dim=cfg.fc_dim, n_fc_layer=cfg.fc_layer_num,
        p_emb=cfg.dropouti, p_gnn=cfg.dropoutg, p_fc=cfg.dropoutf,
        init_std=cfg.init_range, gnn_backend=cfg.gnn_backend,
        gnn_dtype=resolve_gnn_dtype(cfg.gnn_dtype), gnn_mesh=gnn_mesh)
    return dataset, model, cp_emb, pretrained_encoder


def resolve_gnn_dtype(name: str):
    """'auto' -> bfloat16 on TPU (the analog of the reference's fp16 amp,
    reference qagnn.py:232-234), float32 elsewhere."""
    import jax
    import jax.numpy as jnp

    if name == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
    if name not in ("bfloat16", "float32"):
        raise ValueError(
            f"--gnn_dtype must be one of auto/bfloat16/float32, got {name!r}")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def load_pretrained_encoder(cfg: TrainConfig):
    """Resolve the encoder config + pretrained weights for --encoder_load.

    The reference ALWAYS starts from HF pretrained weights (reference
    modeling/modeling_encoder.py:102-108); here the checkpoint source is the
    explicit --encoder_load path/name (an HF save_pretrained dir, a torch
    state-dict file, or a cached hub name) because the training hosts have no
    network egress. When a config.json rides with the weights it wins over
    the name-based preset, so shapes always match the checkpoint.
    """
    if not cfg.encoder_load:
        return encoder_config_for(cfg), None

    import jax.numpy as jnp

    from qagnn_tpu.models.hf_loading import load_encoder_checkpoint

    dtype = jnp.bfloat16 if cfg.encoder_dtype == "bfloat16" else jnp.float32
    try:
        fallback = encoder_config_for(cfg)
    except ValueError:
        fallback = None
    return load_encoder_checkpoint(cfg.encoder_load, dtype=dtype,
                                   fallback_config=fallback)


def make_encoder(enc_cfg):
    """Encoder module for a resolved config — the flax counterpart of the
    reference's MODEL_NAME_TO_CLASS dispatch
    (reference modeling/modeling_encoder.py:16-32,89-108)."""
    from qagnn_tpu.models.gpt_encoder import GPTConfig, GPTTextEncoder
    from qagnn_tpu.models.lstm_encoder import LSTMConfig, LSTMTextEncoder
    from qagnn_tpu.models.text_encoder import TextEncoder
    from qagnn_tpu.models.xlnet_encoder import XLNetConfig, XLNetTextEncoder

    if isinstance(enc_cfg, GPTConfig):
        return GPTTextEncoder(enc_cfg)
    if isinstance(enc_cfg, XLNetConfig):
        return XLNetTextEncoder(enc_cfg)
    if isinstance(enc_cfg, LSTMConfig):
        return LSTMTextEncoder.from_config(enc_cfg)
    return TextEncoder(enc_cfg)


def encoder_config_for(cfg: TrainConfig):
    import jax.numpy as jnp

    from qagnn_tpu.models.gpt_encoder import GPTConfig
    from qagnn_tpu.models.text_encoder import TextEncoderConfig
    from qagnn_tpu.models.xlnet_encoder import XLNetConfig

    dtype = jnp.bfloat16 if cfg.encoder_dtype == "bfloat16" else jnp.float32
    name = cfg.encoder
    if name == "lstm":
        from qagnn_tpu.data.word_tokenizer import WordTokenizer
        from qagnn_tpu.models.lstm_encoder import LSTMConfig
        if not cfg.lstm_vocab:
            raise ValueError("--encoder lstm requires --lstm_vocab "
                             "(build with word_tokenizer.make_word_vocab)")
        vocab_size = WordTokenizer(cfg.lstm_vocab).vocab_size
        return LSTMConfig(vocab_size=vocab_size)
    if name == "tiny-lstm":
        from qagnn_tpu.models.lstm_encoder import LSTMConfig
        vocab_size = 256
        if cfg.lstm_vocab:
            from qagnn_tpu.data.word_tokenizer import WordTokenizer
            vocab_size = WordTokenizer(cfg.lstm_vocab).vocab_size
        return LSTMConfig.tiny(vocab_size=vocab_size)
    if name == "tiny-gpt":
        return GPTConfig.tiny(dtype=dtype)
    if name == "tiny-xlnet":
        return XLNetConfig.tiny(dtype=dtype)
    if "gpt" in name:
        return GPTConfig.openai_gpt(dtype=dtype)
    if name.startswith("xlnet-large"):
        return XLNetConfig.xlnet_large(dtype=dtype)
    if name.startswith("xlnet"):
        return XLNetConfig(dtype=dtype)
    if name == "roberta-large":
        return TextEncoderConfig.roberta_large(dtype=dtype)
    if name == "roberta-base":
        return TextEncoderConfig.roberta_base(dtype=dtype)
    if "SapBERT" in name or name.startswith("bert-base"):
        return TextEncoderConfig.bert_base(dtype=dtype)
    if name == "bert-large-uncased" or name == "bert-large-cased":
        return TextEncoderConfig.bert_base(hidden_size=1024, num_layers=24,
                                           num_heads=16,
                                           intermediate_size=4096, dtype=dtype)
    if name.startswith("albert-xxlarge"):
        return TextEncoderConfig.albert_xxlarge(dtype=dtype)
    if name.startswith("albert"):
        return TextEncoderConfig.albert_base(dtype=dtype)
    if name == "tiny":  # tests / smoke runs
        return TextEncoderConfig.tiny(dtype=dtype)
    raise ValueError(
        f"unsupported encoder {name!r} (roberta/bert/SapBERT/albert/gpt/"
        "xlnet families implemented; lstm via --encoder lstm)")


def train(cfg: TrainConfig) -> dict:
    import jax
    import jax.numpy as jnp

    prng = cfg.prng_impl
    if prng == "auto":   # hardware RNG on TPU: +2.5%, measurement-stable
        prng = "rbg" if jax.default_backend() == "tpu" else "default"
    if prng and prng != "default":
        jax.config.update("jax_default_prng_impl", prng)

    from qagnn_tpu.train.optim import build_train_optimizer
    from qagnn_tpu.train.step import (
        accuracy, init_train_state, make_eval_step, make_train_step)
    from qagnn_tpu.utils.checkpoint import save_checkpoint

    os.makedirs(cfg.save_dir, exist_ok=True)
    cfg.export(os.path.join(cfg.save_dir, "config.json"))
    log_path = os.path.join(cfg.save_dir, "log.csv")
    with open(log_path, "w") as f:
        f.write("step,dev_acc,test_acc\n")

    # ---- device mesh, decided BEFORE the model is built (replaces the
    # reference's 2-GPU split, reference qagnn.py:132-140): with a model
    # axis > 1 the model itself must partition the fused Pallas kernels
    # over it (GSPMD cannot split a Mosaic custom call, so GATConvE routes
    # through the shard_map form in parallel/edge_shard_pallas) -----------
    mesh = None
    gnn_mesh = None
    n_model = max(1, cfg.mesh_model)
    if cfg.mesh_data:
        n_data = cfg.mesh_data
        assert cfg.batch_size % n_data == 0, (
            f"batch_size {cfg.batch_size} must divide over {n_data} "
            "data-parallel devices")
        assert cfg.eval_batch_size % n_data == 0, (
            f"eval_batch_size {cfg.eval_batch_size} must divide over "
            f"{n_data} data-parallel devices")
    else:
        # auto: as many data-parallel devices as both batch sizes divide over
        n_data = max(1, jax.device_count() // n_model)
        while cfg.batch_size % n_data or cfg.eval_batch_size % n_data:
            n_data -= 1
    if n_data * n_model > 1:
        from qagnn_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data, n_model)
        from qagnn_tpu.ops.gat_attention import default_backend
        if (cfg.gnn_backend or default_backend()) == "pallas":
            # ANY mesh: the fused kernels run via shard_map (graphs over
            # data, edges over model) — GSPMD cannot partition Mosaic
            # calls and would otherwise gather the full batch per device
            # (see tools/collective_audit.py)
            gnn_mesh = mesh
            print(f"| mesh {n_data}x{n_model}: fused Pallas kernels run "
                  "via shard_map (data x edge partitioning) |", flush=True)

    dataset, model, cp_emb, pretrained_encoder = build_model_and_data(
        cfg, gnn_mesh=gnn_mesh)
    if pretrained_encoder is None and cfg.encoder != "tiny":
        print(f"WARNING: encoder {cfg.encoder!r} starts from RANDOM weights "
              "— pass --encoder_load for the reference's pretrained-LM "
              "behavior", flush=True)

    rng = jax.random.PRNGKey(cfg.seed)
    _, sample = next(dataset.train())
    steps_per_epoch = max(1, dataset.train_size() // cfg.batch_size)

    # params + optimizer (init under the scatter backend: no Mosaic compile,
    # no 16 MiB forward-vmem pin — see qagnn_tpu.utils.initialization)
    import jax.tree_util as jtu

    from qagnn_tpu.utils.initialization import init_variables
    variables = init_variables(model, rng, sample.lm_inputs, sample.graph)
    params = variables["params"]

    # frozen entity table mask (reference --freeze_ent_emb, qagnn.py:63)
    frozen_mask = None
    if cfg.freeze_ent_emb:
        def is_table(path, leaf):
            keys = [getattr(k, "key", str(k)) for k in path]
            return "concept_emb" in keys and "embedding" in keys
        frozen_mask = jtu.tree_map_with_path(is_table, params)

    optimizer = build_train_optimizer(
        params, optim=cfg.optim, encoder_lr=cfg.encoder_lr,
        decoder_lr=cfg.decoder_lr, weight_decay=cfg.weight_decay,
        max_grad_norm=cfg.max_grad_norm, lr_schedule=cfg.lr_schedule,
        warmup_steps=int(cfg.warmup_steps),
        total_steps=cfg.n_epochs * steps_per_epoch,
        frozen_param_mask=frozen_mask)

    from qagnn_tpu.train.step import TrainState
    pretrained = {"decoder": {"concept_emb": {"emb": {
        "embedding": jnp.asarray(cp_emb)}}}}
    if pretrained_encoder is not None:
        pretrained["encoder"] = pretrained_encoder
    from qagnn_tpu.train.step import _merge_pretrained
    params = _merge_pretrained(params, pretrained)
    state = TrainState(params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=optimizer.init(params),
                       step=jnp.zeros([], jnp.int32), rng=rng)

    # Warm-start / resume (reference qagnn.py:163-166 --load_model_path —
    # but restoring FULL state: params + BN stats + optimizer + step).
    if cfg.load_model_path:
        from qagnn_tpu.utils.checkpoint import load_checkpoint, restore_into
        loaded, _ = load_checkpoint(cfg.load_model_path)
        state = restore_into(state, loaded)
        print(f"resumed from {cfg.load_model_path} at step "
              f"{int(state.step)}", flush=True)

    # ---- parameter inventory (reference qagnn.py:199-206) ----------------
    def _count(tree):
        return sum(x.size for x in jax.tree.leaves(tree))
    enc_params = _count(state.params.get("encoder", {}))
    dec_params = _count(state.params.get("decoder", {}))
    print(f"| encoder params {enc_params:,} | decoder params {dec_params:,} "
          f"| total {_count(state.params):,} |", flush=True)

    # ---- place state + batches on the mesh built above -------------------
    if mesh is not None:
        from qagnn_tpu.parallel.mesh import (
            param_shardings, replicated, shard_batch)
        rep = replicated(mesh)
        state = state.replace(
            params=jax.device_put(state.params,
                                  param_shardings(state.params, mesh)),
            batch_stats=jax.device_put(state.batch_stats, rep),
            opt_state=jax.device_put(state.opt_state, rep),
            step=jax.device_put(state.step, rep),
            rng=jax.device_put(state.rng, rep))
        print(f"| mesh data={n_data} model={n_model} "
              f"({jax.device_count()} devices) |", flush=True)
        _place = lambda b: shard_batch(b, mesh)
    else:
        _place = lambda b: b

    num_mb = max(1, cfg.batch_size // cfg.mini_batch_size) \
        if cfg.mini_batch_size > 0 else 1
    train_step = make_train_step(model, optimizer, loss_name=cfg.loss,
                                 num_microbatches=num_mb,
                                 encoder_layer_id=cfg.encoder_layer)
    eval_step = make_eval_step(model, encoder_layer_id=cfg.encoder_layer)

    # edges aggregated per train step — the BASELINE.json throughput unit,
    # printed per log interval. Counted from REAL (mask-true) edges per
    # batch: the padded edge budget would inflate edges/s whenever bucketed
    # batches carry masked slots, whereas the reference's dynamic edge list
    # counts only real edges by construction (reference
    # modeling/modeling_qagnn.py:244-251).

    def evaluate(split_iter):
        correct, total = 0, 0
        preds = []
        for qids, batch, pad in split_iter:
            batch = _place(batch)
            logits = np.asarray(eval_step(state.params, state.batch_stats,
                                          batch.lm_inputs, batch.graph))
            n = logits.shape[0] - pad
            correct += int((logits[:n].argmax(1) ==
                            np.asarray(batch.labels[:n])).sum())
            total += n
            preds.extend(zip(qids, logits[:n].argmax(1).tolist()))
        return (correct / max(total, 1)), preds

    best_dev_acc, final_test_acc, best_dev_epoch = 0.0, 0.0, 0
    global_step, total_loss, interval_edges = 0, 0.0, 0
    loss_history: list[float] = []
    start = time.time()

    profiling = False
    for epoch in range(cfg.n_epochs):
        encoder_trainable = (epoch >= cfg.unfreeze_epoch
                             and epoch < cfg.refreeze_epoch)
        for qids, batch in dataset.train():
            if cfg.profile_dir and global_step == cfg.profile_start_step:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            interval_edges += int(np.asarray(batch.graph.edge_mask).sum()) \
                * cfg.k
            # static bool: the frozen variant's compile drops the encoder
            # backward entirely (two cached compiles at most)
            state, metrics = train_step(state, _place(batch),
                                        encoder_trainable)
            total_loss += float(metrics["loss"])
            loss_history.append(float(metrics["loss"]))
            if profiling and global_step >= (cfg.profile_start_step
                                             + cfg.profile_num_steps - 1):
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                print(f"| profiler trace written to {cfg.profile_dir} |",
                      flush=True)
            if (global_step + 1) % cfg.log_interval == 0:
                dt = (time.time() - start) / cfg.log_interval
                print(f"| step {global_step:5} | loss "
                      f"{total_loss / cfg.log_interval:7.4f} | ms/batch "
                      f"{1000 * dt:7.2f} | edges/s "
                      f"{interval_edges / (dt * cfg.log_interval):10.3g} |",
                      flush=True)
                total_loss, interval_edges, start = 0.0, 0, time.time()
            global_step += 1

        dev_acc, _ = evaluate(dataset.dev())
        test_acc, test_preds = (0.0, [])
        if dataset.test_size() > 0:
            test_acc, test_preds = evaluate(dataset.test())
        print(f"| epoch {epoch:3} | dev_acc {dev_acc:7.4f} | test_acc "
              f"{test_acc:7.4f} |", flush=True)
        with open(log_path, "a") as f:
            f.write(f"{global_step},{dev_acc},{test_acc}\n")

        if cfg.save_model and test_preds:
            ppath = os.path.join(cfg.save_dir,
                                 f"predictions_test_e{epoch}.csv")
            with open(ppath, "w") as f:
                for qid, p in test_preds:
                    f.write(f"{qid},{chr(ord('A') + int(p))}\n")

        if dev_acc >= best_dev_acc:
            best_dev_acc, final_test_acc, best_dev_epoch = (
                dev_acc, test_acc, epoch)
            if cfg.save_model:
                save_checkpoint(os.path.join(cfg.save_dir, "checkpoint"),
                                state, cfg)
        if epoch > cfg.unfreeze_epoch and \
                epoch - best_dev_epoch >= cfg.max_epochs_before_stop:
            break

    print(f"| best dev_acc {best_dev_acc:.4f} (epoch {best_dev_epoch}) | "
          f"final test_acc {final_test_acc:.4f} |")
    return {"best_dev_acc": best_dev_acc, "final_test_acc": final_test_acc,
            "best_dev_epoch": best_dev_epoch, "train_losses": loss_history}


def eval_detail(cfg: TrainConfig) -> dict:
    """Standalone evaluation from a checkpoint (reference qagnn.py:343-430)."""
    import jax.numpy as jnp

    from qagnn_tpu.train.step import make_eval_step
    from qagnn_tpu.utils.checkpoint import load_checkpoint

    state_dict, saved_cfg = load_checkpoint(cfg.load_model_path)
    # encoder_load is kept when the path still exists: the checkpoint
    # supplies the WEIGHTS (params below replace whatever the builder
    # loaded), but on offline hosts the encoder_load directory is also
    # the only TOKENIZER source — nulling it unconditionally broke
    # eval_detail anywhere the hub is unreachable.
    if saved_cfg.encoder_load and not os.path.exists(
            str(saved_cfg.encoder_load)):
        saved_cfg.encoder_load = None
    dataset, model, _, _ = build_model_and_data(saved_cfg)
    eval_step = make_eval_step(model, encoder_layer_id=saved_cfg.encoder_layer)

    params, batch_stats = state_dict["params"], state_dict["batch_stats"]

    # Detail mode (reference qagnn.py:407-424 + modeling_qagnn.py:236-241):
    # beyond the prediction CSV, dump the analysis tensors — pooler
    # attention, per-layer GNN edge/self-loop alphas, and the graph tensors
    # the reference echoes back — for the first `detail_batches` test
    # batches (the full-split alpha tensors are TB-scale; the reference
    # computes and discards them, qagnn.py:416).
    detail_batches = cfg.detail_batches
    detail_step = None
    if detail_batches:
        from qagnn_tpu.train.step import make_detail_step
        detail_step = make_detail_step(
            model, encoder_layer_id=saved_cfg.encoder_layer)

    def evaluate(split_iter, out_csv=None, detail_path=None):
        correct, total, rows, detailed = 0, 0, [], 0
        for qids, batch, pad in split_iter:
            if detail_path and detailed < detail_batches:
                logits, pool_attn, (edge_a, self_a) = detail_step(
                    params, batch_stats, batch.lm_inputs, batch.graph)
                g = batch.graph
                np.savez_compressed(
                    f"{detail_path}.{detailed}.npz",
                    qids=np.asarray(qids), logits=np.asarray(logits),
                    pool_attn=np.asarray(pool_attn),
                    gnn_edge_alpha=np.asarray(edge_a),
                    gnn_self_alpha=np.asarray(self_a),
                    concept_ids=np.asarray(g.concept_ids),
                    node_types=np.asarray(g.node_types),
                    edge_src=np.asarray(g.edge_src),
                    edge_dst=np.asarray(g.edge_dst),
                    edge_type=np.asarray(g.edge_type),
                    edge_mask=np.asarray(g.edge_mask))
                detailed += 1
                logits = np.asarray(logits)
            else:
                logits = np.asarray(eval_step(params, batch_stats,
                                              batch.lm_inputs, batch.graph))
            n = logits.shape[0] - pad
            labels = np.asarray(batch.labels[:n])
            correct += int((logits[:n].argmax(1) == labels).sum())
            total += n
            rows.extend((q, chr(ord("A") + int(p)))
                        for q, p in zip(qids, logits[:n].argmax(1)))
        if out_csv:
            with open(out_csv, "w") as f:
                csv.writer(f).writerows(rows)
        return correct / max(total, 1)

    dev_acc = evaluate(dataset.dev())
    test_acc = evaluate(dataset.test(),
                        os.path.join(cfg.save_dir, "predictions_test.csv"),
                        detail_path=os.path.join(cfg.save_dir, "test_detail")) \
        if dataset.test_size() else 0.0
    print(f"| dev_acc {dev_acc:.4f} | test_acc {test_acc:.4f} |")
    return {"dev_acc": dev_acc, "test_acc": test_acc}


def main(argv=None):
    cfg = config_from_argv(argv)
    if cfg.mode == "train":
        return train(cfg)
    if cfg.mode == "eval_detail":
        return eval_detail(cfg)
    raise ValueError(f"invalid mode {cfg.mode!r}")


if __name__ == "__main__":
    main()
