"""Per-question subgraph extraction: grounded concepts -> schema graph .pk.

Port of reference utils/graph.py:250-519 (the 2-hop-all-pair + LM-relevance
pipeline): for each (question, choice)

  1. extra nodes = common neighbors of every pair of grounded q/a nodes
     (reference Part1, utils/graph.py:315-324),
  2. every node scored by an LM ("question + concept-name" relevance;
     reference get_LM_score, utils/graph.py:281-313) — pluggable here, since
     this offline environment has no pretrained weights,
  3. schema graph = qc + ac + extra sorted by score desc; adjacency among the
     selected nodes over the BASE (non-inverse) relations as a (R*N, N) bool
     COO matrix (reference concepts2adj, utils/graph.py:114-129; inverse
     relations are added downstream by the data loader).

Output pickle rows {'adj', 'concepts', 'qmask', 'amask', 'cid2score'} are
byte-compatible with what qagnn_tpu.data.graphs.load_graph_pk (and the
reference loader) consume.
"""

from __future__ import annotations

import json
import pickle
from multiprocessing import Pool
from typing import Callable, Sequence

import numpy as np
from scipy.sparse import coo_matrix

from qagnn_tpu.preprocess.kg import KG

# scorer: (question_text, concept_names) -> list of float scores
Scorer = Callable[[str, Sequence[str]], Sequence[float]]

_KG: KG | None = None


def extra_nodes_2hop_all_pair(kg: KG, qa_nodes: set[int]) -> list[int]:
    """Common neighbors of every ordered pair of grounded nodes
    (reference utils/graph.py:318-323)."""
    extra: set[int] = set()
    nodes = [n for n in qa_nodes if 0 <= n < kg.n_nodes]
    nbrs = {n: kg.neighbors(n) for n in nodes}
    for i, q in enumerate(nodes):
        for a in nodes:
            if q == a:
                continue
            common = np.intersect1d(nbrs[q], nbrs[a], assume_unique=True)
            extra.update(int(x) for x in common)
    return sorted(extra - qa_nodes)


def concepts_to_adj(kg: KG, node_ids: Sequence[int]):
    """(R*N, N) bool COO over base relations among `node_ids`
    (reference concepts2adj, utils/graph.py:114-129)."""
    cids = np.asarray(node_ids, dtype=np.int32)
    n_rel, n_node = kg.n_base_rels, len(cids)
    adj = np.zeros((n_rel, n_node, n_node), dtype=np.uint8)
    pos = {int(c): i for i, c in enumerate(cids)}
    for s_i, c in enumerate(cids):
        dsts, rels = kg.out_edges(int(c))
        for d, r in zip(dsts, rels):
            t_i = pos.get(int(d))
            if t_i is not None and 0 <= r < n_rel:
                adj[r][s_i][t_i] = 1
    return coo_matrix(adj.reshape(-1, n_node)), cids


def default_uniform_scorer(question: str, names: Sequence[str]):
    """No-LM fallback: all-zero scores (like the reference's MedQA pipeline,
    which sets cid2score=None — utils_biomed notebook cells 22-23)."""
    return [0.0] * len(names)


def make_torch_mlm_scorer(model_name_or_path: str, device: str = "cpu",
                          batch_size: int = 50) -> Scorer:
    """The reference's scorer: score(concept) = -MLM loss of
    'question concept.' under RoBERTa (reference utils/graph.py:254-313).
    Requires local pretrained weights (no downloads here)."""
    import torch
    from transformers import AutoTokenizer, RobertaForMaskedLM

    tok = AutoTokenizer.from_pretrained(model_name_or_path)
    model = RobertaForMaskedLM.from_pretrained(model_name_or_path)
    model.to(device).eval()

    def scorer(question: str, names: Sequence[str]):
        sents = [question.lower() if n is None
                 else f"{question.lower()} {' '.join(n.split('_'))}."
                 for n in names]
        scores = []
        for a in range(0, len(sents), batch_size):
            chunk = sents[a: a + batch_size]
            enc = tok(chunk, padding=True, return_tensors="pt").to(device)
            with torch.no_grad():
                out = model(**enc, labels=enc["input_ids"])
                logits = out.logits
                # per-sentence summed token loss, sign-flipped
                lf = torch.nn.CrossEntropyLoss(reduction="none")
                loss = lf(logits.view(-1, logits.size(-1)),
                          enc["input_ids"].view(-1))
                loss = loss.view(len(chunk), -1) * enc["attention_mask"]
                scores += (-loss.sum(1)).cpu().tolist()
        return scores

    return scorer


def score_nodes(kg: KG, question: str, node_ids: Sequence[int],
                scorer: Scorer) -> dict[int, float]:
    """cid2score including the context node under key -1
    (reference get_LM_score, utils/graph.py:281-313)."""
    names: list[str | None] = [None] + [kg.id2concept[i] for i in node_ids]
    scores = scorer(question, names)
    pairs = list(zip([-1] + list(node_ids), scores))
    return dict(sorted(pairs, key=lambda x: -x[1]))


def _worker_init(kg_path: str):
    global _KG
    _KG = KG.load(kg_path)
    _KG.build_indices()


def _worker_part1(item):
    q_ids, a_ids, question = item
    extra = extra_nodes_2hop_all_pair(_KG, set(q_ids) | set(a_ids))
    return (sorted(q_ids), sorted(a_ids), question, extra)


def _worker_part3(item):
    q_ids, a_ids, question, extra, cid2score = item
    if cid2score is not None:
        extra = sorted(extra, key=lambda x: -cid2score[x])
    schema = list(q_ids) + list(a_ids) + list(extra)
    ar = np.arange(len(schema))
    qmask = ar < len(q_ids)
    amask = (ar >= len(q_ids)) & (ar < len(q_ids) + len(a_ids))
    adj, concepts = concepts_to_adj(_KG, schema)
    return {"adj": adj, "concepts": concepts, "qmask": qmask,
            "amask": amask, "cid2score": cid2score}


def generate_adj_data_from_grounded_concepts(
        grounded_path: str, kg_path: str, output_path: str,
        statement_path: str | None = None,
        scorer: Scorer | None = default_uniform_scorer,
        num_processes: int = 1,
        fallback_q: str | None = None,
        fallback_a: str | None = None) -> None:
    """Driver (reference generate_adj_data_from_grounded_concepts__use_LM,
    utils/graph.py:463-519). `scorer=None` emits cid2score=None rows (the
    DDB/MedQA variant). `fallback_q`/`fallback_a` name concepts substituted
    for empty question/answer sets (the MedQA notebook's
    concept2id['31770']/['325'] fallbacks, cell 23)."""
    kg = KG.load(kg_path)
    kg.build_indices()
    global _KG
    _KG = kg

    if statement_path is None:
        statement_path = grounded_path.replace("grounded", "statement")
    with open(grounded_path, encoding="utf-8") as f:
        grounded = [json.loads(l) for l in f if l.strip()]
    with open(statement_path, encoding="utf-8") as f:
        statements = [json.loads(l) for l in f if l.strip()]
    assert len(grounded) % len(statements) == 0
    n_choices = len(grounded) // len(statements)

    c2i = kg.concept2id
    qa_data = []
    for j, dic in enumerate(grounded):
        q_ids = {c2i[c] for c in dic["qc"] if c in c2i}
        a_ids = {c2i[c] for c in dic["ac"] if c in c2i}
        if not q_ids and fallback_q is not None:
            q_ids = {c2i[fallback_q]}
        if not a_ids and fallback_a is not None:
            a_ids = {c2i[fallback_a]}
        q_ids -= a_ids
        stem = statements[j // n_choices]["question"]["stem"]
        qa_data.append((q_ids, a_ids, f"{stem} {dic['ans']}."))

    if num_processes > 1:
        with Pool(num_processes, initializer=_worker_init,
                  initargs=(kg_path,)) as p:
            res1 = list(p.imap(_worker_part1, qa_data, chunksize=8))
    else:
        res1 = [_worker_part1(x) for x in qa_data]

    # Part 2 (LM scoring) is serial like the reference (GPU-bound there)
    res2 = []
    for q_ids, a_ids, question, extra in res1:
        cid2score = (None if scorer is None else
                     score_nodes(kg, question,
                                 list(q_ids) + list(a_ids) + list(extra),
                                 scorer))
        res2.append((q_ids, a_ids, question, extra, cid2score))

    if num_processes > 1:
        with Pool(num_processes, initializer=_worker_init,
                  initargs=(kg_path,)) as p:
            res3 = list(p.imap(_worker_part3, res2, chunksize=8))
    else:
        res3 = [_worker_part3(x) for x in res2]

    with open(output_path, "wb") as f:
        pickle.dump(res3, f)
