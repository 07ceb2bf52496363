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


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "a", "cat", "dog", "sat", "on", "mat", "ran", "fast",
         "what", "did", "do", "?", "animal", "says", "meow", "woof"]


def _write_dataset(root, n_questions=4, n_choices=2, n_concept=50):
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/statement", exist_ok=True)
    os.makedirs(f"{root}/graph", exist_ok=True)

    for split, n in [("train", n_questions), ("dev", 2), ("test", 2)]:
        with open(f"{root}/statement/{split}.statement.jsonl", "w") as f:
            for i in range(n):
                d = {"id": f"{split}-{i}",
                     "answerKey": "AB"[int(rng.integers(0, n_choices))],
                     "question": {
                         "stem": "what did the cat do ?",
                         "choices": [{"label": "A", "text": "sat on the mat"},
                                     {"label": "B", "text": "ran fast"}]}}
                f.write(json.dumps(d) + "\n")
        rows = []
        for _ in range(n * n_choices):
            nn_ = int(rng.integers(2, 6))
            concepts = rng.choice(n_concept - 1, nn_, replace=False).astype(np.int64)
            qm = np.zeros(nn_, bool); qm[0] = True
            am = np.zeros(nn_, bool)
            if nn_ > 1:
                am[1] = True
            dense = rng.random((3 * nn_, nn_)) < 0.4
            cid2score = {int(c): float(rng.standard_normal()) for c in concepts}
            cid2score[-1] = 0.0
            rows.append({"adj": sp.coo_matrix(dense), "concepts": concepts,
                         "qmask": qm, "amask": am, "cid2score": cid2score})
        with open(f"{root}/graph/{split}.graph.adj.pk", "wb") as f:
            pickle.dump(rows, f)

    emb_path = f"{root}/ent_emb.npy"
    np.save(emb_path, rng.standard_normal((n_concept, 24)).astype(np.float32))
    return emb_path


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
    monkeypatch.setattr(cli, "build_model_and_data",
                        lambda cfg, tokenizer=None: orig(cfg, tokenizer=tok))

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
