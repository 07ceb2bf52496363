"""Offline preprocessing pipeline (CPU): raw data -> model-ready artifacts.

Ports of the reference's preprocessing vertical (reference preprocess.py,
utils/conceptnet.py, utils/convert_csqa.py, utils/convert_obqa.py,
utils/grounding.py, utils/graph.py) with two deliberate departures:

  * the KG is stored as numpy CSR arrays (.npz), not a networkx gpickle —
    faster to load, no networkx version coupling;
  * concept grounding uses a built-in rule lemmatizer + n-gram matcher
    instead of spaCy (unavailable offline); same matching contract
    (lemma-sequence patterns over the concept vocabulary, stopword pruning,
    hard-ground fallback).
"""

from qagnn_tpu.preprocess.conceptnet import (
    MERGED_RELATIONS,
    construct_graph,
    extract_english,
)
from qagnn_tpu.preprocess.kg import KG
from qagnn_tpu.preprocess.convert import (
    convert_to_entailment,
    convert_to_obqa_statement,
)
from qagnn_tpu.preprocess.grounding import create_matcher, ground
from qagnn_tpu.preprocess.graph_extraction import (
    generate_adj_data_from_grounded_concepts,
)

__all__ = [
    "MERGED_RELATIONS", "construct_graph", "extract_english", "KG",
    "convert_to_entailment", "convert_to_obqa_statement",
    "create_matcher", "ground", "generate_adj_data_from_grounded_concepts",
]
