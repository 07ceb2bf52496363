"""End-to-end preprocessing vertical: synthetic raw ConceptNet CSV + raw
CSQA jsonl -> extract -> KG -> convert -> ground -> subgraphs -> feed the
result into the training data loader."""

import json
import os

import numpy as np
import pytest

from qagnn_tpu.preprocess.conceptnet import (
    MERGED_RELATIONS,
    construct_graph,
    extract_english,
)
from qagnn_tpu.preprocess.convert import (
    convert_to_entailment,
    get_fitb_from_question,
    replace_wh_word_with_blank,
)
from qagnn_tpu.preprocess.grounding import create_matcher, ground, ground_qa_pair
from qagnn_tpu.preprocess.graph_extraction import (
    generate_adj_data_from_grounded_concepts,
)
from qagnn_tpu.preprocess.kg import KG
from qagnn_tpu.preprocess.lemma import normalize, tokenize


RAW_ASSERTIONS = [
    # (uri-rel, head, tail) — weight 1.0
    ("/r/AtLocation", "/c/en/lantern", "/c/en/antique_shop"),
    ("/r/AtLocation", "/c/en/lantern", "/c/en/house"),
    ("/r/AtLocation", "/c/en/lantern", "/c/en/dark_place"),
    ("/r/UsedFor", "/c/en/lantern/n", "/c/en/light"),
    ("/r/RelatedTo", "/c/en/house", "/c/en/light"),
    ("/r/RelatedTo", "/c/en/antique_shop", "/c/en/light"),
    ("/r/IsA", "/c/en/house", "/c/en/building"),
    ("/r/HasA", "/c/en/house", "/c/en/roof"),       # *partof swap
    ("/r/MotivatedByGoal", "/c/en/run", "/c/en/health"),  # *causes swap
    ("/r/HasContext", "/c/en/light", "/c/en/physics"),    # pruned edge
    ("/r/IsA", "/c/en/cat", "/c/en/animal"),
    ("/r/NotARelation", "/c/en/cat", "/c/en/dog"),        # dropped rel
    ("/r/IsA", "/c/en/voiture", "/c/fr/vehicule"),        # non-English tail
]


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    raw_csv = root / "assertions.csv"
    with open(raw_csv, "w") as f:
        for rel, h, t in RAW_ASSERTIONS:
            f.write("\t".join(["/a/x", rel, h, t,
                               json.dumps({"weight": 1.0})]) + "\n")

    en_csv, vocab, kg_npz = (str(root / n) for n in
                             ("en.csv", "concept.txt", "kg.npz"))
    extract_english(str(raw_csv), en_csv, vocab)
    kg = construct_graph(en_csv, vocab, kg_npz, prune=True)
    return root, en_csv, vocab, kg_npz, kg


def test_extract_english_merges_and_swaps(pipeline):
    root, en_csv, vocab, kg_npz, kg = pipeline
    rows = [l.split("\t") for l in open(en_csv).read().splitlines()]
    rels = {r[0] for r in rows}
    assert "atlocation" in rels and "usedfor" in rels
    assert "hasa" not in rels and "partof" in rels       # merged+swapped
    # *hasa swaps head/tail: roof partof house
    assert ["partof", "roof", "house", "1.0"] in rows
    assert ["causes", "health", "run", "1.0"] in rows    # *motivatedbygoal
    # non-English and unknown-relation rows dropped
    assert not any("voiture" in r for r in rows)
    assert not any(r[0] == "notarelation" for r in rows)


def test_construct_graph_semantics(pipeline):
    _, _, vocab, _, kg = pipeline
    c2i = kg.concept2id
    n = len(MERGED_RELATIONS)
    # hascontext pruned
    assert len(kg.rels_between(c2i["light"], c2i["physics"])) == 0
    # forward + inverse
    fr = kg.rels_between(c2i["lantern"], c2i["house"])
    assert MERGED_RELATIONS.index("atlocation") in fr.tolist()
    inv = kg.rels_between(c2i["house"], c2i["lantern"])
    assert MERGED_RELATIONS.index("atlocation") + n in inv.tolist()


def test_kg_save_load_roundtrip(pipeline):
    _, _, _, kg_npz, kg = pipeline
    kg2 = KG.load(kg_npz)
    assert kg2.n_nodes == kg.n_nodes
    np.testing.assert_array_equal(kg2.edge_src, kg.edge_src)
    assert kg2.id2concept == kg.id2concept


def test_wh_word_blanking():
    assert "___" in replace_wh_word_with_blank(
        "Where would you find a lantern?")
    fitb = get_fitb_from_question(
        "If a lantern is not for sale, where is it likely to be?")
    assert "___" in fitb
    # no wh-word -> blank appended
    assert get_fitb_from_question("The sky is blue").endswith("___")


def test_lemma_normalize():
    assert normalize("cats") == "cat"
    assert normalize("running") == "run"
    assert normalize("houses") == "house"
    assert normalize("went") == "go"
    assert tokenize("Where's the Cat?") == ["where's", "the", "cat"]


def test_grounding_matches_concepts(pipeline):
    _, _, vocab, _, _ = pipeline
    matcher = create_matcher(vocab)
    row = ground_qa_pair(
        matcher, "the lanterns are in the antique shop", "antique shop")
    assert "lantern" in row["qc"]           # plural matched via normalize
    assert "antique_shop" in row["ac"]
    assert "antique_shop" not in row["qc"]  # answer span excluded from qc


def test_full_vertical_into_data_loader(pipeline, tmp_path):
    root, _, vocab, kg_npz, kg = pipeline
    # raw CSQA-style file: 2 questions, 3 choices
    raw = tmp_path / "raw.jsonl"
    qs = [
        {"id": "q1", "answerKey": "B",
         "question": {"stem": "If a lantern is not for sale, where is it "
                              "likely to be?",
                      "choices": [{"label": "A", "text": "antique shop"},
                                  {"label": "B", "text": "house"},
                                  {"label": "C", "text": "dark place"}]}},
        {"id": "q2", "answerKey": "A",
         "question": {"stem": "What is a cat?",
                      "choices": [{"label": "A", "text": "animal"},
                                  {"label": "B", "text": "building"},
                                  {"label": "C", "text": "roof"}]}},
    ]
    with open(raw, "w") as f:
        for q in qs:
            f.write(json.dumps(q) + "\n")

    st = str(tmp_path / "train.statement.jsonl")
    gr = str(tmp_path / "train.grounded.jsonl")
    pk = str(tmp_path / "train.graph.adj.pk")
    convert_to_entailment(str(raw), st)
    ground(st, vocab, gr, num_processes=1)
    grounded = [json.loads(l) for l in open(gr)]
    assert len(grounded) == 6               # 2 questions x 3 choices
    assert all(r["ac"] for r in grounded[:3])

    generate_adj_data_from_grounded_concepts(
        gr, kg_npz, pk, statement_path=st, num_processes=1)

    # consume with the training-side loader
    from qagnn_tpu.data.graphs import load_graph_pk
    data = load_graph_pk(pk, max_node_num=10, use_cache=False)
    assert len(data) == 6
    assert data.n_relations == 2 * (len(MERGED_RELATIONS) + 2)
    assert (data.num_nodes >= 1).all()
    # the lantern/house/antique_shop rows have real edges
    assert any(e.shape[1] > 0 for e in data.edge_indices)
    # q1 choice B (house): lantern should be among question concepts
    c2i = kg.concept2id
    row_b = data.concept_ids[1]
    assert (c2i["lantern"] + 1) in row_b.tolist()


def test_create_embeddings_glove_matches_reference(tmp_path):
    """GOLDEN: triple-corpus pooled concept/relation embeddings vs the
    reference's own glove_init tail (utils/conceptnet.py:216-384), file
    for file, for both poolings."""
    import json
    import sys

    import numpy as np

    from qagnn_tpu.preprocess.conceptnet import (
        create_embeddings_glove, glove_init)

    # tiny GloVe table (dim 4) with an OOV word ("zebra") in the corpus
    words = ["the", "cat", "big", "dog", "chases", "is", "a"]
    rng = np.random.default_rng(0)
    table = rng.standard_normal((len(words), 4)).round(3)
    glove_txt = tmp_path / "glove.txt"
    with open(glove_txt, "w") as f:
        for w, v in zip(words, table):
            f.write(w + " " + " ".join(str(x) for x in v) + "\n")

    corpus = [
        {"string": "the big cat chases a dog", "rel": "atlocation",
         "subj_start": 1, "subj_end": 3, "obj_start": 5, "obj_end": 6},
        {"string": "a dog is a zebra friend", "rel": "relatedto",
         "subj_start": 1, "subj_end": 2, "obj_start": 4, "obj_end": 6},
        {"string": "the big cat is big", "rel": "atlocation",
         "subj_start": 1, "subj_end": 3, "obj_start": 4, "obj_end": 5},
    ]
    corpus_path = tmp_path / "tp_str_corpus.json"
    corpus_path.write_text(json.dumps(corpus))

    # --- reference side (np.float alias removed in modern numpy) ---------
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    if not hasattr(np, "float"):
        np.float = float  # the reference uses the removed alias
    sys.path.insert(0, "/root/reference")
    try:
        from utils.conceptnet import glove_init as ref_glove_init
        ref_glove_init(str(glove_txt), str(ref_dir / "emb"),
                       str(corpus_path))
    finally:
        sys.path.remove("/root/reference")

    # --- my side ----------------------------------------------------------
    my_dir = tmp_path / "mine"
    my_dir.mkdir()
    glove_init(str(glove_txt), str(my_dir / "emb.npy"),
               str(my_dir / "emb.vocab.txt"))
    create_embeddings_glove(str(corpus_path), str(my_dir / "emb.npy"),
                            str(my_dir / "emb.vocab.txt"),
                            str(my_dir), "emb", pooling="max", dim=4)

    for name in ["concept.emb.max.npy", "relation.emb.max.npy"]:
        np.testing.assert_allclose(
            np.load(my_dir / name), np.load(ref_dir / name),
            atol=1e-6, err_msg=name)
    for name in ["concept.glove.max.txt", "relation.glove.max.txt"]:
        assert (my_dir / name).read_text().strip() == \
            (ref_dir / name).read_text().strip(), name
