"""Data-layer golden tests: my graph loader vs the REFERENCE's own loader
(imported from /root/reference as an oracle) on a synthetic .pk fixture,
plus statement tokenization with a local (offline) tokenizer."""

import json
import os
import pickle
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from qagnn_tpu.data.graphs import load_graph_pk
from qagnn_tpu.data.loader import QAGNNDataLoader
from qagnn_tpu.data.statements import load_statements, read_statement_jsonl


def _make_fixture_rows(rng, n_rows, half_n_rel=3, max_nodes=8):
    rows = []
    for _ in range(n_rows):
        n = int(rng.integers(2, max_nodes))
        concepts = rng.choice(100, size=n, replace=False).astype(np.int64)
        n_q = int(rng.integers(1, n + 1))
        n_a = int(rng.integers(0, n - n_q + 1))
        qm = np.zeros(n, bool); qm[:n_q] = True
        am = np.zeros(n, bool); am[n_q:n_q + n_a] = True
        dense = rng.random((half_n_rel * n, n)) < 0.3
        adj = sp.coo_matrix(dense)
        cid2score = {int(c): float(rng.standard_normal()) for c in concepts}
        cid2score[-1] = float(rng.standard_normal())  # context node score
        rows.append({"adj": adj, "concepts": concepts, "qmask": qm,
                     "amask": am, "cid2score": cid2score})
    return rows


@pytest.fixture(scope="module")
def fixture_pk(tmp_path_factory):
    rng = np.random.default_rng(0)
    rows = _make_fixture_rows(rng, n_rows=6)
    path = tmp_path_factory.mktemp("graphs") / "test.graph.adj.pk"
    with open(path, "wb") as f:
        pickle.dump(rows, f)
    return str(path), rows


def _reference_loader(path, max_node_num, num_choice):
    """Run the reference's load_sparse_adj_data_with_contextnode as oracle."""
    sys.path.insert(0, "/root/reference")
    try:
        from utils.data_utils import load_sparse_adj_data_with_contextnode
        class _Args:  # the reference signature takes an unused args object
            pass
        return load_sparse_adj_data_with_contextnode(
            path, max_node_num, num_choice, _Args())
    finally:
        sys.path.remove("/root/reference")


def test_graph_loader_matches_reference_oracle(fixture_pk):
    path, rows = fixture_pk
    max_node_num = 6  # force pruning on some rows
    mine = load_graph_pk(path, max_node_num=max_node_num, use_cache=False)

    torch = pytest.importorskip("torch")
    concept_ids, node_type_ids, node_scores, adj_lengths, (edge_index, edge_type) = \
        _reference_loader(path, max_node_num, num_choice=2)

    # the oracle reshapes to (n_questions, n_choice, ...); flatten back
    ref_concepts = concept_ids.reshape(-1, max_node_num).numpy()
    ref_types = node_type_ids.reshape(-1, max_node_num).numpy()
    ref_scores = node_scores.reshape(-1, max_node_num).numpy()
    ref_lengths = adj_lengths.reshape(-1).numpy()
    ref_edges = [e for pair in edge_index for e in pair]
    ref_etypes = [t for pair in edge_type for t in pair]

    np.testing.assert_array_equal(mine.concept_ids, ref_concepts)
    np.testing.assert_array_equal(mine.node_types, ref_types)
    np.testing.assert_allclose(mine.node_scores, ref_scores, atol=1e-6)
    np.testing.assert_array_equal(mine.num_nodes, ref_lengths)
    assert mine.n_relations == 2 * (3 + 2)

    for g, (ei, et) in enumerate(zip(ref_edges, ref_etypes)):
        ei, et = ei.numpy(), et.numpy()
        # compare as edge SETS (src, dst, rel)
        ref_set = set(zip(ei[0].tolist(), ei[1].tolist(), et.tolist()))
        my_set = set(zip(mine.edge_indices[g][0].tolist(),
                         mine.edge_indices[g][1].tolist(),
                         mine.edge_types[g].tolist()))
        assert my_set == ref_set, f"graph {g} edge mismatch"


def test_graph_loader_cache_roundtrip(fixture_pk, tmp_path):
    path, _ = fixture_pk
    a = load_graph_pk(path, max_node_num=6, use_cache=True)   # writes cache
    b = load_graph_pk(path, max_node_num=6, use_cache=True)   # reads cache
    np.testing.assert_array_equal(a.concept_ids, b.concept_ids)
    np.testing.assert_array_equal(a.num_nodes, b.num_nodes)
    for x, y in zip(a.edge_indices, b.edge_indices):
        np.testing.assert_array_equal(x, y)
    os.remove(path + ".tpu_cache.npz")


# ---------------------------------------------------------------------------
# statements
# ---------------------------------------------------------------------------

def _local_tokenizer(tmp_path):
    """Offline WordPiece tokenizer (no downloads)."""
    from transformers import BertTokenizerFast
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "a", "cat", "dog", "sat", "on", "mat", "ran", "fast",
             "what", "did", "do", "?", "animal", "says", "meow", "woof"]
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)


def _statement_jsonl(tmp_path, n=3, n_choices=3):
    path = tmp_path / "train.statement.jsonl"
    with open(path, "w") as f:
        for i in range(n):
            d = {
                "id": f"q{i}",
                "answerKey": "AB C"[i % 3].strip() or "A",
                "question": {
                    "stem": "what did the cat do ?",
                    "choices": [{"label": l, "text": t} for l, t in
                                zip("ABC", ["sat on the mat", "ran fast",
                                            "says meow"])],
                },
            }
            if i == 1:
                d["answerKey"] = "B"
            f.write(json.dumps(d) + "\n")
    return str(path)


def test_statement_loading_shapes_and_labels(tmp_path):
    tok = _local_tokenizer(tmp_path)
    path = _statement_jsonl(tmp_path)
    data = load_statements(path, "unused", max_seq_len=16, tokenizer=tok)
    assert data.n_choices == 3
    assert data.inputs["input_ids"].shape == (3, 3, 16)
    assert data.inputs["attention_mask"].shape == (3, 3, 16)
    assert data.labels.tolist()[1] == 1  # answerKey B
    # CLS at position 0, choice text differs across choices
    ids = data.inputs["input_ids"]
    assert (ids[:, :, 0] == tok.cls_token_id).all()
    assert not np.array_equal(ids[0, 0], ids[0, 1])
    # special_tokens_mask marks CLS/SEP (the reference's output_mask)
    stm = data.inputs["special_tokens_mask"][0, 0]
    assert stm[0] == 1


def test_full_loader_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    tok = _local_tokenizer(tmp_path)
    st_path = _statement_jsonl(tmp_path)
    rows = _make_fixture_rows(rng, n_rows=9)  # 3 questions x 3 choices
    pk = tmp_path / "train.graph.adj.pk"
    with open(pk, "wb") as f:
        pickle.dump(rows, f)

    loader = QAGNNDataLoader(
        train_statements=st_path, train_adj=str(pk),
        dev_statements=st_path, dev_adj=str(pk),
        model_name="unused", max_node_num=8, max_seq_len=16,
        batch_size=2, eval_batch_size=2, tokenizer=tok, seed=0)
    assert loader.train_size() == 3

    batches = list(loader.train())
    assert len(batches) == 2  # ceil(3/2) with fill
    qids, batch = batches[0]
    assert batch.lm_inputs["input_ids"].shape == (2, 3, 16)
    assert batch.graph.concept_ids.shape[0] == 6  # 2 questions x 3 choices
    assert batch.labels.shape == (2,)
    # edge bucket fixed across batches
    assert batches[0][1].graph.edge_src.shape == batches[1][1].graph.edge_src.shape

    # eval iterator pads the tail and reports pad count
    evs = list(loader.dev())
    assert sum(len(q) for q, _, _ in evs) == 3
    assert evs[-1][2] == 1  # 3 questions, batch 2 -> last padded by 1
