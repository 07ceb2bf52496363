"""Statement (question/choices) loading + tokenization.

Replaces reference utils/data_utils.py:283-478 (load_bert_xlnet_roberta_
input_tensors / load_input_tensors): same on-disk format (statement .jsonl,
one question per line with question.stem, question.choices, answerKey,
optional para/fact1 prefixes), same pair layout ([CLS] context [SEP](x2 for
roberta) question+choice [SEP], longest-first truncation), emitted as fixed
shape (n_questions, n_choices, max_seq_len) numpy arrays ready for device
upload — not torch tensors.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np


@dataclass
class StatementData:
    qids: list[str]
    labels: np.ndarray                 # (n,) int64
    inputs: dict[str, np.ndarray]      # each (n, n_choices, max_seq_len)
    n_choices: int

    def __len__(self):
        return len(self.qids)


def read_statement_jsonl(path: str):
    """Yield (qid, label, context, endings) per question.

    Mirrors reference read_examples (utils/data_utils.py:308-325): context is
    the stem, prefixed by para/fact1 when present; label from answerKey.
    """
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            d = json.loads(line)
            label = ord(d["answerKey"]) - ord("A") if "answerKey" in d else 0
            context = d["question"]["stem"]
            if "para" in d:
                context = d["para"] + " " + context
            if "fact1" in d:
                context = d["fact1"] + " " + context
            endings = [c["text"] for c in d["question"]["choices"]]
            out.append((d["id"], label, context, endings))
    return out


def load_statements(path: str, model_name: str, max_seq_len: int,
                    tokenizer=None) -> StatementData:
    """Tokenize all questions x choices to fixed-shape arrays.

    Uses the HF fast tokenizer with pair inputs, which reproduces the
    reference's manual token assembly (CLS/SEP placement incl. RoBERTa's
    double-SEP, longest-first pair truncation — utils/data_utils.py:330-430).
    """
    if tokenizer is None:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(model_name)

    examples = read_statement_jsonl(path)
    n_choices = max(len(e[3]) for e in examples)

    texts_a, texts_b = [], []
    for _, _, context, endings in examples:
        for c in range(n_choices):
            ending = endings[min(c, len(endings) - 1)]
            texts_a.append(context)
            # reference prepends the (empty) question field + " "
            texts_b.append(" " + ending)

    enc = tokenizer(texts_a, texts_b, max_length=max_seq_len,
                    truncation="longest_first", padding="max_length",
                    return_token_type_ids=True,
                    return_special_tokens_mask=True)

    n = len(examples)

    def shape(key):
        return np.asarray(enc[key], dtype=np.int32).reshape(n, n_choices,
                                                            max_seq_len)

    inputs = {
        "input_ids": shape("input_ids"),
        "attention_mask": shape("attention_mask"),
        "token_type_ids": shape("token_type_ids"),
        # 1 marks special tokens — the reference's `output_mask`
        # (utils/data_utils.py:404-405)
        "special_tokens_mask": shape("special_tokens_mask"),
    }
    return StatementData(
        qids=[e[0] for e in examples],
        labels=np.asarray([e[1] for e in examples], np.int64),
        inputs=inputs,
        n_choices=n_choices,
    )
