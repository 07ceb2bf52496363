"""Accuracy-parity dress rehearsal: the blocked real-data CSQA run as ONE
command, with a synthetic fallback that executes in CI today.

The BASELINE accuracy target (CSQA dev 0.7707, reference README.md:115-126)
needs the preprocessed datasets and a pretrained roberta-large checkpoint —
neither exists on these offline hosts. This script packages the run so the
day the data appears it is:

    python tools/dress_rehearsal.py --dataset csqa --data_root data \
        --encoder_load /path/to/roberta-large --train

What it does, in order:
  1. builds the driver TrainConfig for the dataset (same presets as
     `python -m qagnn_tpu.cli --dataset csqa`, reference run_qagnn__csqa.sh),
  2. loads the first train batch through the REAL data pipeline
     (statements + graph .pk + entity embeddings),
  3. **step-0 encoder parity**: runs the HF *torch* model from the same
     checkpoint dir on the identical tokenized inputs and compares our
     flax encoder's pooled sent_vecs elementwise (the reference's encoder IS
     HF torch — reference modeling/modeling_encoder.py:89-143 — so this is
     a direct numerical check against the reference's step-0 sent_vecs),
  4. prints step-0 logits + loss for the batch (the quantities to diff
     against a reference-side torch run of modeling_qagnn.LM_QAGNN on the
     same batch; that half needs torch_geometric, absent here),
  5. with --train: runs the full training loop and reports dev/test
     accuracy against the 0.7707 target.

--synthetic generates a tiny reference-format dataset + a tiny HF BERT
checkpoint (qagnn_tpu.data.synthetic) and runs steps 1-4 end-to-end — the
CI-executable rehearsal of the exact code path.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SENT_VEC_RTOL = 2e-3   # bf16/f32 mixed encoder vs torch f32, CLS-pool path
SENT_VEC_ATOL = 2e-3


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="csqa",
                    choices=["csqa", "obqa", "medqa_usmle"])
    ap.add_argument("--data_root", default="data",
                    help="reference data layout root (README 'Data "
                         "acquisition'): {root}/{dataset}/statement/... ")
    ap.add_argument("--encoder_load", default=None,
                    help="HF save_pretrained dir (e.g. roberta-large)")
    ap.add_argument("--encoder", default=None,
                    help="encoder family override (default: dataset preset)")
    ap.add_argument("--train", action="store_true",
                    help="run full training and report dev/test accuracy "
                         "vs the reference targets")
    ap.add_argument("--synthetic", action="store_true",
                    help="generate a tiny dataset+checkpoint and rehearse "
                         "the pipeline hermetically (CI mode)")
    ap.add_argument("--batch_size", type=int, default=None)
    return ap.parse_args()


REFERENCE_DEV_ACC = {"csqa": 0.7707, "obqa": 0.686, "medqa_usmle": 0.38}


def build_cfg(args, root, encoder_load, tmp):
    from qagnn_tpu.utils.config import preset

    overrides = {"encoder": args.encoder} if args.encoder else {}
    cfg = preset(args.dataset, **overrides)
    cfg.encoder_load = encoder_load
    cfg.save_dir = os.path.join(tmp, "saved")
    if args.batch_size:
        cfg.batch_size = args.batch_size
        cfg.mini_batch_size = min(cfg.mini_batch_size, args.batch_size)
    d = args.dataset
    cfg.train_statements = f"{root}/{d}/statement/train.statement.jsonl"
    cfg.dev_statements = f"{root}/{d}/statement/dev.statement.jsonl"
    cfg.test_statements = f"{root}/{d}/statement/test.statement.jsonl"
    cfg.train_adj = f"{root}/{d}/graph/train.graph.adj.pk"
    cfg.dev_adj = f"{root}/{d}/graph/dev.graph.adj.pk"
    cfg.test_adj = f"{root}/{d}/graph/test.graph.adj.pk"
    cfg.inhouse_train_qids = f"{root}/{d}/inhouse_split_qids.txt"
    return cfg


def build_synthetic(args, tmp):
    from qagnn_tpu.data.synthetic import (
        write_synthetic_dataset, write_tiny_bert_checkpoint)
    from qagnn_tpu.utils.config import TrainConfig

    droot = os.path.join(tmp, "data")
    emb_path = write_synthetic_dataset(droot, n_questions=4)
    enc_dir = write_tiny_bert_checkpoint(os.path.join(tmp, "bert_tiny"))

    cfg = TrainConfig(dataset="csqa", encoder="bert-base-uncased",
                      encoder_load=enc_dir, inhouse=False,
                      batch_size=4, mini_batch_size=4, eval_batch_size=4,
                      n_epochs=1, max_seq_len=24, max_node_num=8,
                      num_relation=7, save_dir=os.path.join(tmp, "saved"))
    cfg.train_statements = f"{droot}/statement/train.statement.jsonl"
    cfg.dev_statements = f"{droot}/statement/dev.statement.jsonl"
    cfg.test_statements = f"{droot}/statement/test.statement.jsonl"
    cfg.train_adj = f"{droot}/graph/train.graph.adj.pk"
    cfg.dev_adj = f"{droot}/graph/dev.graph.adj.pk"
    cfg.test_adj = f"{droot}/graph/test.graph.adj.pk"
    cfg.ent_emb_paths = (emb_path,)
    return cfg, enc_dir


def torch_sent_vecs(encoder_dir, lm_inputs, layer_id):
    """The reference's encoder path: HF torch AutoModel, pooled like
    modeling/modeling_encoder.py:120-143 (bert family: pooler over
    hidden_states[layer_id])."""
    import numpy as np
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(encoder_dir)
    model.eval()
    ids = np.asarray(lm_inputs["input_ids"])
    mask = np.asarray(lm_inputs["attention_mask"])
    B, C, L = ids.shape
    kwargs = {}
    if "token_type_ids" in lm_inputs:
        kwargs["token_type_ids"] = torch.tensor(
            np.asarray(lm_inputs["token_type_ids"]).reshape(B * C, L))
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids.reshape(B * C, L)),
                    attention_mask=torch.tensor(mask.reshape(B * C, L)),
                    output_hidden_states=True, **kwargs)
        hidden = out.hidden_states[layer_id]
        if hasattr(model, "pooler") and model.pooler is not None:
            pooled = model.pooler(hidden)
        else:
            pooled = hidden[:, 0]
    return pooled.numpy()


def main():
    args = parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
    if args.synthetic:
        # hermetic CI mode: tiny shapes, keep off the (possibly busy) chip
        jax.config.update("jax_platforms", "cpu")

    import qagnn_tpu.cli as cli

    tmp = tempfile.mkdtemp(prefix="qagnn_rehearsal_")
    if args.synthetic:
        cfg, encoder_dir = build_synthetic(args, tmp)
    else:
        if not args.encoder_load:
            raise SystemExit("--encoder_load is required (or --synthetic)")
        cfg = build_cfg(args, args.data_root, args.encoder_load, tmp)
        encoder_dir = args.encoder_load
        for p in (cfg.train_statements, cfg.train_adj):
            if not os.path.exists(p):
                raise SystemExit(
                    f"missing {p} — fetch per README 'Data acquisition'")

    report = {"dataset": cfg.dataset, "encoder": cfg.encoder,
              "synthetic": bool(args.synthetic)}

    # ---- steps 1-2: real pipeline up to the first batch -------------------
    dataset, model, cp_emb, pretrained_encoder = cli.build_model_and_data(cfg)
    qids, batch = next(dataset.train())
    print(f"| loaded first batch: {len(qids)} questions, graph "
          f"{batch.graph.concept_ids.shape} edges "
          f"{batch.graph.edge_src.shape} |", flush=True)

    rng = jax.random.PRNGKey(cfg.seed)
    from qagnn_tpu.utils.initialization import init_variables
    variables = init_variables(model, rng, batch.lm_inputs, batch.graph)
    from qagnn_tpu.train.step import _merge_pretrained
    pretrained = {"decoder": {"concept_emb": {"emb": {
        "embedding": jnp.asarray(cp_emb)}}}}
    if pretrained_encoder is not None:
        pretrained["encoder"] = pretrained_encoder
    params = _merge_pretrained(variables["params"], pretrained)

    # ---- step 3: step-0 sent_vecs vs the reference's torch encoder --------
    if pretrained_encoder is not None and hasattr(model, "encoder"):
        # pooled sent_vecs through the model's own encoder submodule
        enc = model.encoder
        B, C, L = batch.lm_inputs["input_ids"].shape
        flat = {k: v.reshape(B * C, v.shape[-1])
                for k, v in batch.lm_inputs.items()}
        ours = enc.apply({"params": params["encoder"]}, **flat,
                         layer_id=cfg.encoder_layer)
        want = torch_sent_vecs(encoder_dir, batch.lm_inputs,
                               cfg.encoder_layer)
        diff = np.abs(np.asarray(ours, np.float32) - want)
        scale = np.maximum(np.abs(want), 1.0)
        rel = float((diff / scale).max())
        report["sent_vec_max_rel"] = rel
        ok = rel < max(SENT_VEC_RTOL, SENT_VEC_ATOL)
        print(f"| step-0 sent_vecs vs torch: max rel {rel:.2e} "
              f"{'OK' if ok else 'FAIL'} |", flush=True)
        if not ok:
            report["status"] = "FAIL"
            print(json.dumps(report))
            return 1
    else:
        print("| encoder parity skipped (no pretrained encoder loaded) |")

    # ---- step 4: step-0 logits + loss -------------------------------------
    from qagnn_tpu.train.losses import LOSSES
    from qagnn_tpu.train.step import make_eval_step
    eval_step = make_eval_step(model, encoder_layer_id=cfg.encoder_layer)
    logits = eval_step(params, variables.get("batch_stats", {}),
                       batch.lm_inputs, batch.graph)
    loss = LOSSES[cfg.loss](logits, batch.labels)
    report["step0_loss"] = float(loss)
    report["step0_logits_mean"] = float(jnp.mean(logits))
    print(f"| step-0 loss {float(loss):.6f} | logits mean "
          f"{float(jnp.mean(logits)):.6f} | (diff these against a torch "
          f"reference run of LM_QAGNN on the same batch) |", flush=True)

    # ---- step 5: the real run ---------------------------------------------
    if args.train:
        result = cli.train(cfg)
        target = REFERENCE_DEV_ACC.get(cfg.dataset)
        report.update(result)
        report["reference_dev_acc"] = target
        print(f"| final dev_acc {result.get('best_dev_acc')} vs reference "
              f"{target} |", flush=True)

    report.setdefault("status", "OK")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
