"""ConceptNet ETL: raw assertions CSV -> English triples -> merged-relation KG.

Port of reference utils/conceptnet.py:16-213 (extract_english,
construct_graph) with identical relation merging, blacklist, inverse-edge and
dedup semantics, emitting a qagnn_tpu.preprocess.kg.KG (.npz) instead of a
networkx gpickle.
"""

from __future__ import annotations

import json

import numpy as np

from qagnn_tpu.preprocess.kg import KG

# reference utils/conceptnet.py:16-34
RELATION_GROUPS = [
    "atlocation/locatednear",
    "capableof",
    "causes/causesdesire/*motivatedbygoal",
    "createdby",
    "desires",
    "antonym/distinctfrom",
    "hascontext",
    "hasproperty",
    "hassubevent/hasfirstsubevent/haslastsubevent/hasprerequisite/entails/mannerof",
    "isa/instanceof/definedas",
    "madeof",
    "notcapableof",
    "notdesires",
    "partof/*hasa",
    "relatedto/similarto/synonym",
    "usedfor",
    "receivesaction",
]

# reference utils/conceptnet.py:36-54 (order matters: relation ids)
MERGED_RELATIONS = [
    "antonym", "atlocation", "capableof", "causes", "createdby", "isa",
    "desires", "hassubevent", "partof", "hascontext", "hasproperty",
    "madeof", "notcapableof", "notdesires", "receivesaction", "relatedto",
    "usedfor",
]

# reference utils/conceptnet.py:57-75 — used by LM scoring prompts
RELATION_TEXT = [
    "is the antonym of", "is at location of", "is capable of", "causes",
    "is created by", "is a kind of", "desires", "has subevent",
    "is part of", "has context", "has property", "is made of",
    "is not capable of", "does not desires", "is", "is related to",
    "is used for",
]

# reference utils/conceptnet.py:165 (construct_graph blacklist)
GRAPH_BLACKLIST = frozenset(
    ["uk", "us", "take", "make", "object", "person", "people"])


def load_merge_relation() -> dict[str, str]:
    """rel-name -> merged name; '*' prefix means swap head/tail
    (reference utils/conceptnet.py:78-88)."""
    mapping = {}
    for line in RELATION_GROUPS:
        ls = line.strip().split("/")
        rel = ls[0]
        for l in ls:
            if l.startswith("*"):
                mapping[l[1:]] = "*" + rel
            else:
                mapping[l] = rel
    return mapping


def del_pos(s: str) -> str:
    """Strip /n /a /v /r part-of-speech suffix (reference :91-99)."""
    if s.endswith(("/n", "/a", "/v", "/r")):
        return s[:-2]
    return s


def extract_english(conceptnet_path: str, output_csv_path: str,
                    output_vocab_path: str) -> None:
    """English triples with merged relations (reference :102-153).

    Output lines: rel \t head \t tail \t weight. Vocabulary in first-seen
    order (this order IS the concept-id assignment downstream).
    """
    relation_mapping = load_merge_relation()
    seen = set()
    vocab = []
    with open(conceptnet_path, encoding="utf8") as fin, \
            open(output_csv_path, "w", encoding="utf8") as fout:
        for line in fin:
            toks = line.strip().split("\t")
            if len(toks) < 5:
                continue
            if not (toks[2].startswith("/c/en/")
                    and toks[3].startswith("/c/en/")):
                continue
            rel = toks[1].split("/")[-1].lower()
            head = del_pos(toks[2]).split("/")[-1].lower()
            tail = del_pos(toks[3]).split("/")[-1].lower()
            if not head.replace("_", "").replace("-", "").isalpha():
                continue
            if not tail.replace("_", "").replace("-", "").isalpha():
                continue
            if rel not in relation_mapping:
                continue
            rel = relation_mapping[rel]
            if rel.startswith("*"):
                head, tail, rel = tail, head, rel[1:]
            weight = json.loads(toks[4])["weight"]
            fout.write(f"{rel}\t{head}\t{tail}\t{weight}\n")
            for w in (head, tail):
                if w not in seen:
                    seen.add(w)
                    vocab.append(w)
    with open(output_vocab_path, "w", encoding="utf8") as f:
        f.write("\n".join(vocab) + "\n")


def construct_graph(cpnet_csv_path: str, cpnet_vocab_path: str,
                    output_path: str, prune: bool = True) -> KG:
    """Build the directed multigraph with inverse relations rel+17
    (reference :156-213): dedup (subj, obj, rel), drop self-loops, and when
    pruning drop blacklisted concepts and 'hascontext' edges."""
    with open(cpnet_vocab_path, encoding="utf8") as f:
        id2concept = [w.strip() for w in f if w.strip()]
    concept2id = {w: i for i, w in enumerate(id2concept)}
    relation2id = {r: i for i, r in enumerate(MERGED_RELATIONS)}
    n_rel = len(MERGED_RELATIONS)

    srcs, dsts, rels = [], [], []
    attrs = set()
    with open(cpnet_csv_path, encoding="utf8") as fin:
        for line in fin:
            ls = line.strip().split("\t")
            if len(ls) < 4:
                continue
            rel = relation2id[ls[0]]
            subj = concept2id[ls[1]]
            obj = concept2id[ls[2]]
            if prune and (ls[1] in GRAPH_BLACKLIST or ls[2] in GRAPH_BLACKLIST
                          or MERGED_RELATIONS[rel] == "hascontext"):
                continue
            if subj == obj:
                continue
            if (subj, obj, rel) not in attrs:
                srcs.append(subj); dsts.append(obj); rels.append(rel)
                attrs.add((subj, obj, rel))
                srcs.append(obj); dsts.append(subj); rels.append(rel + n_rel)
                attrs.add((obj, subj, rel + n_rel))

    kg = KG(n_nodes=len(id2concept), n_base_rels=n_rel,
            edge_src=np.asarray(srcs, np.int32),
            edge_dst=np.asarray(dsts, np.int32),
            edge_rel=np.asarray(rels, np.int16),
            id2concept=id2concept)
    if output_path:
        kg.save(output_path)
    return kg


def glove_init(glove_txt_path: str, output_npy_path: str,
               vocab_path: str) -> None:
    """Entity-embedding table from a GloVe-format text file
    (reference :216-260 head; the random-init tail for OOV entities is the
    caller's concern in the reference and is omitted here)."""
    words, vectors = [], []
    with open(glove_txt_path, "rb") as f:
        for line in f:
            fields = line.split()
            if len(fields) <= 2:
                continue
            words.append(fields[0].decode("utf-8"))
            vectors.append(np.fromiter((float(x) for x in fields[1:]),
                                       dtype=np.float64))
    np.save(output_npy_path, np.asarray(vectors, dtype=np.float32))
    with open(vocab_path, "w", encoding="utf-8") as f:
        f.write("\n".join(words))
