"""Statement-tensorization GOLDEN tests: my loaders vs the REFERENCE's own
load_bert_xlnet_roberta_input_tensors / load_gpt_input_tensors imported from
/root/reference, using tiny offline tokenizers (no downloads)."""

import json
import sys

import numpy as np
import pytest

from qagnn_tpu.data.statements import (
    load_gpt_statements,
    load_pair_statements,
    load_statements,
)

pytest.importorskip("torch")


def _statement_jsonl(tmp_path, with_para=False):
    path = tmp_path / "x.statement.jsonl"
    rows = [
        ("what did the cat do ?",
         ["sat on the mat", "ran very fast", "says meow meow"], "B"),
        ("the dog says what ?",
         ["woof woof woof", "meow", "sat on a dog on a mat on a dog"], "C"),
        ("a cat sat on the mat and the dog ran fast so what did the cat "
         "say to the dog on the mat ?",
         ["meow", "woof", "the cat sat"], "A"),
    ]
    with open(path, "w") as f:
        for i, (stem, choices, key) in enumerate(rows):
            d = {"id": f"q{i}", "answerKey": key,
                 "question": {"stem": stem,
                              "choices": [{"label": l, "text": t}
                                          for l, t in zip("ABC", choices)]}}
            if with_para and i == 0:
                d["para"] = "the animal story ."
            f.write(json.dumps(d) + "\n")
    return str(path)


def _bert_tokenizer_dir(tmp_path):
    from transformers import BertTokenizerFast
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "a", "cat", "dog", "sat", "on", "mat", "ran", "fast",
             "what", "did", "do", "?", "animal", "says", "meow", "woof",
             "very", "so", "say", "to", "and", "story", "."]
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)
    d = tmp_path / "bert_tok"
    tok.save_pretrained(str(d))
    return str(d), tok


def _roberta_tokenizer_dir(tmp_path):
    """Tiny byte-level BPE (no merges -> per-byte tokens)."""
    from transformers import RobertaTokenizerFast
    # byte-level alphabet as used by GPT-2/RoBERTa
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode
    byte_vocab = list(bytes_to_unicode().values())
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {t: i for i, t in enumerate(specials + byte_vocab)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = RobertaTokenizerFast(vocab_file=str(tmp_path / "vocab.json"),
                               merges_file=str(tmp_path / "merges.txt"))
    d = tmp_path / "roberta_tok"
    tok.save_pretrained(str(d))
    return str(d), tok


def _reference_pair_loader(path, model_type, model_name, max_seq_len):
    sys.path.insert(0, "/root/reference")
    try:
        from utils.data_utils import load_bert_xlnet_roberta_input_tensors
        return load_bert_xlnet_roberta_input_tensors(
            path, model_type, model_name, max_seq_len)
    finally:
        sys.path.remove("/root/reference")


def _assert_pair_golden(mine, ref):
    qids, labels, input_ids, input_mask, segment_ids, output_mask = ref
    assert mine.qids == list(qids)
    np.testing.assert_array_equal(mine.labels, labels.numpy())
    np.testing.assert_array_equal(mine.inputs["input_ids"],
                                  input_ids.numpy())
    np.testing.assert_array_equal(mine.inputs["attention_mask"],
                                  input_mask.numpy())
    np.testing.assert_array_equal(mine.inputs["token_type_ids"],
                                  segment_ids.numpy())
    np.testing.assert_array_equal(mine.inputs["special_tokens_mask"],
                                  output_mask.numpy().astype(np.int32))


@pytest.mark.parametrize("max_seq_len", [16, 24])
def test_bert_fast_path_matches_reference(tmp_path, max_seq_len):
    """The HF fast-tokenizer pair path reproduces the reference's manual
    [CLS]/[SEP] assembly incl. truncation (utils/data_utils.py:283-430)."""
    tok_dir, tok = _bert_tokenizer_dir(tmp_path)
    path = _statement_jsonl(tmp_path, with_para=True)
    mine = load_statements(path, "bert-tiny", max_seq_len, tokenizer=tok)
    ref = _reference_pair_loader(path, "bert", tok_dir, max_seq_len)
    _assert_pair_golden(mine, ref)


@pytest.mark.parametrize("max_seq_len", [32, 48])
def test_roberta_fast_path_matches_reference(tmp_path, max_seq_len):
    """RoBERTa double-SEP + all-zero segments + longest-first truncation."""
    tok_dir, tok = _roberta_tokenizer_dir(tmp_path)
    path = _statement_jsonl(tmp_path)
    mine = load_statements(path, "roberta-tiny", max_seq_len, tokenizer=tok)
    ref = _reference_pair_loader(path, "roberta", tok_dir, max_seq_len)
    _assert_pair_golden(mine, ref)


@pytest.mark.parametrize("max_seq_len", [16, 24])
def test_xlnet_manual_path_matches_reference(tmp_path, max_seq_len):
    """XLNet layout: left pad (seg id 4), CLS at end (seg id 2). The
    tokenizer itself is immaterial to the layout, so a WordPiece stand-in
    pins the assembly logic against the reference."""
    tok_dir, tok = _bert_tokenizer_dir(tmp_path)
    path = _statement_jsonl(tmp_path)
    mine = load_pair_statements(path, "xlnet", max_seq_len, tokenizer=tok)
    ref = _reference_pair_loader(path, "xlnet", tok_dir, max_seq_len)
    _assert_pair_golden(mine, ref)


def _gpt_tokenizer(tmp_path):
    """Tiny OpenAI-GPT BPE: per-char tokens with the </w> end-of-word mark."""
    from transformers import OpenAIGPTTokenizer
    chars = sorted(set("abcdefghijklmnopqrstuvwxyz?. "))
    vocab = {"<unk>": 0}
    for c in chars:
        vocab.setdefault(c, len(vocab))
        vocab.setdefault(c + "</w>", len(vocab))
    (tmp_path / "gvocab.json").write_text(json.dumps(vocab))
    (tmp_path / "gmerges.txt").write_text("#version: 0.2\n")
    return OpenAIGPTTokenizer(vocab_file=str(tmp_path / "gvocab.json"),
                              merges_file=str(tmp_path / "gmerges.txt"))


def test_gpt_path_matches_reference(tmp_path, monkeypatch):
    """GPT tensorization golden vs reference load_gpt_input_tensors
    (utils/data_utils.py:203-281), incl. the in-place question truncation
    quirk and -1 lm_label fill."""
    tok = _gpt_tokenizer(tmp_path)
    path = _statement_jsonl(tmp_path)
    max_seq_len = 20

    sys.path.insert(0, "/root/reference")
    try:
        from utils import data_utils as ref_du

        class _Tok:
            @staticmethod
            def from_pretrained(name):
                return _gpt_tokenizer(tmp_path)  # fresh instance per side

        monkeypatch.setattr(ref_du, "OpenAIGPTTokenizer", _Tok)
        qids, mc_labels, input_ids, mc_token_ids, lm_labels = \
            ref_du.load_gpt_input_tensors(path, max_seq_len)
    finally:
        sys.path.remove("/root/reference")

    mine = load_gpt_statements(path, max_seq_len, tokenizer=tok)
    assert mine.qids == list(qids)
    np.testing.assert_array_equal(mine.labels, mc_labels.numpy())
    np.testing.assert_array_equal(mine.inputs["input_ids"],
                                  input_ids.numpy())
    np.testing.assert_array_equal(mine.inputs["cls_token_ids"],
                                  mc_token_ids.numpy())
    np.testing.assert_array_equal(mine.inputs["lm_labels"],
                                  lm_labels.numpy())
