"""Word tokenizer / vocab / LSTM statement tensorization
(reference utils/tokenization_utils.py:15-226 + the LSTM loading path the
reference left unimplemented, utils/data_utils.py:478-480)."""

import json

import numpy as np

from qagnn_tpu.data.statements import load_lstm_statements, load_statements
from qagnn_tpu.data.word_tokenizer import (
    EXTRA_TOKS,
    PAD_TOK,
    SEP_TOK,
    UNK_TOK,
    WordTokenizer,
    WordVocab,
    make_word_vocab,
    tokenize_sentence,
)


def _statements(tmp_path, n=3):
    path = tmp_path / "train.statement.jsonl"
    with open(path, "w") as f:
        for i in range(n):
            d = {"id": f"q{i}", "answerKey": "AB"[i % 2],
                 "question": {"stem": "what did the cat do on the mat ?",
                              "choices": [
                                  {"label": "A", "text": "sat on the mat"},
                                  {"label": "B", "text": "ran fast"}]}}
            f.write(json.dumps(d) + "\n")
    return str(path)


def test_word_vocab_freq_sort_and_cutoff():
    v = WordVocab(sents=["a a a b b c", "a b d"], freq_cutoff=2)
    assert v.idx2w[0] == "a"           # most frequent first
    assert "c" not in v and "d" not in v
    assert len(v) == 2
    v.add_word("zzz")
    assert "zzz" in v
    v.top_k_cutoff(2)
    assert "zzz" not in v and len(v) == 2


def test_word_vocab_save_load_roundtrip(tmp_path):
    v = WordVocab(sents=["x x y y y"], freq_cutoff=0)
    p = tmp_path / "v.txt"
    v.save(str(p))
    v2 = WordVocab(path=str(p), freq_cutoff=0)
    assert v2.idx2w == v.idx2w
    assert {w: int(c) for w, c in v2.counts.items()} == v.counts


def test_make_word_vocab_and_tokenizer_roundtrip(tmp_path):
    st = _statements(tmp_path)
    vpath = tmp_path / "vocab.json"
    w2idx = make_word_vocab([st], str(vpath), freq_cutoff=1)
    # EXTRA_TOKS live at the END (reference tokenization_utils.py:205-206)
    n = len(w2idx)
    assert [t for t, i in sorted(w2idx.items(), key=lambda x: x[1])][-4:] \
        == EXTRA_TOKS

    tok = WordTokenizer(str(vpath))
    assert tok.vocab_size == n
    ids = tok.encode("the cat sat on the mat")
    assert tok.convert_ids_to_tokens(ids) == \
        ["the", "cat", "sat", "on", "the", "mat"]
    # unknown words map to UNK
    assert tok.convert_tokens_to_ids("qwertyzzz") == tok.unk_token_id

    # save/load round-trip (reference run_test, tokenization_utils.py:212-226)
    saved = tok.save_vocabulary(str(tmp_path))
    tok2 = WordTokenizer(saved)
    assert tok2.encode("the cat sat") == tok.encode("the cat sat")


def test_tokenize_sentence_options():
    assert tokenize_sentence("The Cat RAN") == ["the", "cat", "ran"]
    assert tokenize_sentence("in 1998 it ran", convert_num=True)[1] == "<NUM>"


def test_load_lstm_statements_shapes(tmp_path):
    st = _statements(tmp_path)
    vpath = tmp_path / "vocab.json"
    make_word_vocab([st], str(vpath), freq_cutoff=1)
    tok = WordTokenizer(str(vpath))

    data = load_lstm_statements(st, max_seq_len=12, tokenizer=tok)
    assert data.inputs["input_ids"].shape == (3, 2, 12)
    assert data.inputs["lengths"].shape == (3, 2)
    ids, lens = data.inputs["input_ids"], data.inputs["lengths"]
    # SEP separates question and choice; PAD fills the tail
    row = ids[0, 0]
    ln = lens[0, 0]
    assert (row[ln:] == tok.pad_token_id).all()
    assert tok.sep_token_id in row[:ln].tolist()
    # truncation respects max_seq_len
    assert (lens <= 12).all() and (lens >= 1).all()

    # dispatched through the generic loader by family name
    data2 = load_statements(st, "lstm", 12, tokenizer=tok)
    np.testing.assert_array_equal(data2.inputs["input_ids"], ids)
