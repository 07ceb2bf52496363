"""Preprocessing driver: routine tables per dataset.

Port of reference preprocess.py:89-146. Usage:

    python -m qagnn_tpu.preprocess.driver --run common csqa -p 8 \
        --data-root data/

Expects the reference's raw-data layout under --data-root (see the
reference's download_raw_data.sh): cpnet/conceptnet-assertions-5.6.0.csv and
{dataset}/{train,dev,test}_rand_split.jsonl (CSQA) / OBQA equivalents.
"""

from __future__ import annotations

import argparse
import os

from qagnn_tpu.preprocess.conceptnet import construct_graph, extract_english
from qagnn_tpu.preprocess.convert import (
    convert_to_entailment,
    convert_to_obqa_statement,
)
from qagnn_tpu.preprocess.grounding import ground
from qagnn_tpu.preprocess.graph_extraction import (
    default_uniform_scorer,
    generate_adj_data_from_grounded_concepts,
    make_torch_mlm_scorer,
)


def run_common(root: str, nprocs: int) -> None:
    cpnet_csv = f"{root}/cpnet/conceptnet-assertions-5.6.0.csv"
    en_csv = f"{root}/cpnet/conceptnet.en.csv"
    vocab = f"{root}/cpnet/concept.txt"
    kg_npz = f"{root}/cpnet/conceptnet.en.kg.npz"
    if not os.path.exists(en_csv):
        extract_english(cpnet_csv, en_csv, vocab)
    construct_graph(en_csv, vocab, kg_npz, prune=True)


# (raw file name per split, needs-conversion style)
DATASET_RAW = {
    "csqa": {"train": "train_rand_split.jsonl",
             "dev": "dev_rand_split.jsonl",
             "test": "test_rand_split_no_answers.jsonl",
             "style": "csqa"},
    "obqa": {"train": "train.jsonl", "dev": "dev.jsonl",
             "test": "test.jsonl", "style": "obqa"},
}


def run_dataset(dataset: str, root: str, nprocs: int,
                lm_scorer_path: str | None = None) -> None:
    info = DATASET_RAW[dataset]
    vocab = f"{root}/cpnet/concept.txt"
    kg_npz = f"{root}/cpnet/conceptnet.en.kg.npz"
    os.makedirs(f"{root}/{dataset}/statement", exist_ok=True)
    os.makedirs(f"{root}/{dataset}/grounded", exist_ok=True)
    os.makedirs(f"{root}/{dataset}/graph", exist_ok=True)

    scorer = (make_torch_mlm_scorer(lm_scorer_path) if lm_scorer_path
              else default_uniform_scorer)

    for split in ("train", "dev", "test"):
        raw = f"{root}/{dataset}/{info[split]}"
        if not os.path.exists(raw):
            continue
        st = f"{root}/{dataset}/statement/{split}.statement.jsonl"
        gr = f"{root}/{dataset}/grounded/{split}.grounded.jsonl"
        pk = f"{root}/{dataset}/graph/{split}.graph.adj.pk"
        if info["style"] == "csqa":
            convert_to_entailment(raw, st)
        else:
            convert_to_obqa_statement(raw, st)
        ground(st, vocab, gr, num_processes=nprocs)
        generate_adj_data_from_grounded_concepts(
            gr, kg_npz, pk, statement_path=st, scorer=scorer,
            num_processes=nprocs)


def main(argv=None):
    ap = argparse.ArgumentParser("qagnn_tpu.preprocess")
    ap.add_argument("--run", nargs="+", default=["common", "csqa", "obqa"])
    ap.add_argument("-p", "--nprocs", type=int, default=1)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--lm-scorer", default=None,
                    help="local path to a RoBERTa MLM for relevance scoring")
    args = ap.parse_args(argv)

    for routine in args.run:
        if routine == "common":
            run_common(args.data_root, args.nprocs)
        elif routine == "medqa_usmle":
            from qagnn_tpu.preprocess.biomed import run_medqa
            run_medqa(args.data_root, args.nprocs)
        else:
            run_dataset(routine, args.data_root, args.nprocs, args.lm_scorer)


if __name__ == "__main__":
    main()
