"""MedQA/DDB biomed preprocessing: KG build, linking, grounding, subgraphs.

Mirrors the reference utils_biomed/preprocess_medqa_usmle.ipynb behavior on a
tiny synthetic DiseaseDatabase-style KG.
"""

import json
import pickle

import numpy as np
import pytest

from qagnn_tpu.preprocess import biomed


@pytest.fixture
def ddb_dir(tmp_path):
    ddb = tmp_path / "ddb"
    ddb.mkdir()
    # surface_name -> [ptr, preferred_flag]
    names = {
        "Ethanol": ["100", "1"],
        "alcohol": ["100", "0"],
        "Cirrhosis": ["200", "1"],
        "Liver disease": ["300", "1"],
        "Aspirin": ["400", "1"],
        "Fallback Q": ["31770", "1"],
        "Fallback A": ["325", "1"],
    }
    # key -> [subj_ptr, obj_ptr, raw_relation_code]
    relas = {
        "r1": ["100", "200", "2"],    # ethanol may_cause cirrhosis
        "r2": ["200", "300", "3"],    # cirrhosis is_a_subtype_of liver disease
        "r3": ["100", "300", "4"],    # ethanol is_a_risk_factor_of liver dis.
        "r4": ["400", "100", "12"],   # aspirin interacts_with ethanol
        "bad": ["100", "999", "2"],   # dangling pointer -> dropped
    }
    (ddb / "ddb_names.json").write_text(json.dumps(names))
    (ddb / "ddb_relas.json").write_text(json.dumps(relas))
    return ddb


def test_construct_ddb_kg(ddb_dir, tmp_path):
    kg = biomed.construct_ddb_kg(str(ddb_dir / "ddb_names.json"),
                                 str(ddb_dir / "ddb_relas.json"),
                                 str(tmp_path / "ddb.kg.npz"))
    assert kg.n_base_rels == 15
    assert kg.n_nodes == 6
    # 4 valid relations x (forward + inverse)
    assert len(kg.edge_src) == 8
    c2i = kg.concept2id
    # forward rel 2 (may_cause) ethanol->cirrhosis, inverse at 2+15
    rels = kg.rels_between(c2i["100"], c2i["200"])
    assert 2 in rels
    rels_inv = kg.rels_between(c2i["200"], c2i["100"])
    assert 17 in rels_inv


def test_vocab_and_ptrs(ddb_dir, tmp_path):
    ptrs = biomed.build_ddb_vocab(
        str(ddb_dir / "ddb_names.json"), str(ddb_dir / "ddb_relas.json"),
        str(tmp_path / "vocab.txt"), str(tmp_path / "ptrs.txt"))
    vocab = (tmp_path / "vocab.txt").read_text().splitlines()
    assert len(vocab) == len(ptrs) == 6
    assert "Ethanol" in vocab and "alcohol" not in vocab  # preferred only


def test_dictionary_linker(ddb_dir):
    _, _, name_to_ptr, _ = biomed.load_ddb(
        str(ddb_dir / "ddb_names.json"), str(ddb_dir / "ddb_relas.json"))
    linker = biomed.DictionaryEntityLinker(name_to_ptr)
    ents = linker.link("Chronic alcohol use causes liver disease.")
    ptrs = {e["Concept ID"] for e in ents}
    assert ptrs == {"100", "300"}   # alcohol->100, "liver disease"->300
    # multi-word match is greedy-longest: "Liver disease" beats nothing at
    # "liver" alone (not in the table)
    assert any(e["Canonical Name"] == "Liver disease" for e in ents)


def test_umls_to_ddb_table(tmp_path):
    p = tmp_path / "ddb_to_umls_cui.txt"
    p.write_text("header\tddb\tcui\nx\t100\tC0001975\nx\t200\tC0023890\n")
    table = biomed.load_umls_to_ddb(str(p))
    assert table == {"C0001975": "100", "C0023890": "200"}


def test_medqa_end_to_end(ddb_dir, tmp_path):
    root = tmp_path
    raw_dir = root / "medqa_usmle" / "raw" / "questions" / "US" / "4_options"
    raw_dir.mkdir(parents=True)
    rows = [
        {"question": "A patient with cirrhosis drinks alcohol daily. "
                     "Which drug interacts?",
         "options": {"A": "Aspirin", "B": "Water", "C": "Sugar", "D": "Salt"},
         "answer_idx": "A"},
        {"question": "Totally ungroundable question?",
         "options": {"A": "nothing", "B": "here", "C": "at", "D": "all"},
         "answer_idx": "B"},
    ]
    with open(raw_dir / "phrases_no_exclude_dev.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    biomed.run_medqa(str(root), nprocs=1)

    st = [json.loads(l) for l in
          open(root / "medqa_usmle/statement/dev.statement.jsonl")]
    assert len(st) == 2 and len(st[0]["question"]["choices"]) == 4
    assert st[0]["statements"][0]["statement"].endswith("Aspirin")

    gr = [json.loads(l) for l in
          open(root / "medqa_usmle/grounded/dev.grounded.jsonl")]
    assert len(gr) == 8    # 2 questions x 4 choices
    assert "100" in gr[0]["qc"] and "200" in gr[0]["qc"]
    assert gr[0]["ac"] == ["400"]

    with open(root / "medqa_usmle/graph/dev.graph.adj.pk", "rb") as f:
        adj_rows = pickle.load(f)
    assert len(adj_rows) == 8
    r0 = adj_rows[0]
    assert r0["cid2score"] is None
    assert r0["qmask"].sum() >= 2 and r0["amask"].sum() == 1
    # ungroundable question fell back to the designated pointers
    kg = biomed.construct_ddb_kg(str(ddb_dir / "ddb_names.json"),
                                 str(ddb_dir / "ddb_relas.json"))
    c2i = kg.concept2id
    r4 = adj_rows[4]
    assert c2i["31770"] in r4["concepts"] and c2i["325"] in r4["concepts"]

    # the emitted pickle loads through the training-side graph loader
    from qagnn_tpu.data.graphs import load_graph_pk
    data = load_graph_pk(str(root / "medqa_usmle/graph/dev.graph.adj.pk"),
                         max_node_num=20, use_cache=False)
    assert len(data) == 8
    # (15 base + 2 context) * 2 inverse = 34 relations, the MedQA setting
    assert data.n_relations == 34
