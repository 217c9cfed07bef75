"""Value-level coverage for the S8/S12/S14 sources and the candidate JSON
sink (round-1 verdict: these were import-tested only)."""

import json
import os

from pyspark.sql import functions as F

from e2e_el_spark.sources.jsonl import (
    build_el4qa_kb,
    candidates_json_rows,
    read_el4qa_jsonl,
    read_glove_json,
    write_candidates_json,
    write_links_tsv,
)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_el4qa_jsonl_values(spark, tmp_path):
    p = str(tmp_path / "train.jsonl")
    _write(p, [
        json.dumps({
            "id": "q1", "text": "who founded acme labs",
            "mentions": [[12, 21]],
            "label_id": ["W1"], "entity": ["Acme Labs"], "label": ["a company"],
        }),
        json.dumps({
            "id": "q2", "text": "capital of france and spain",
            "mentions": [[11, 17], [22, 27]],
            "label_id": ["W2", "W3"], "entity": ["France", "Spain"],
            "label": ["a country", "another country"],
        }),
    ])
    rows = {(r.question_id, r.mention_idx): r for r in read_el4qa_jsonl(spark, p).collect()}
    assert len(rows) == 3  # q1: 1 mention, q2: 2 mentions
    r = rows[("q1", 0)]
    assert (r.start_index, r.end_index) == (12, 21)
    assert r.text[r.start_index : r.end_index] == "acme labs"
    assert (r.label_candidate_id, r.entity_name) == ("W1", "Acme Labs")
    r2 = rows[("q2", 1)]
    assert (r2.label_candidate_id, r2.entity_name) == ("W3", "Spain")


def test_build_el4qa_kb_first_wins_sep_join(spark, tmp_path):
    """KB text = entity + ' [SEP]' + description, first split wins per id
    (utils_EL4QA.py:15-26)."""
    train = str(tmp_path / "train.jsonl")
    dev = str(tmp_path / "dev.jsonl")
    _write(train, [json.dumps({
        "id": "q1", "text": "t", "mentions": [[0, 1]],
        "label_id": ["W1"], "entity": ["Acme"], "label": ["train description"],
    })])
    _write(dev, [json.dumps({
        "id": "q9", "text": "t", "mentions": [[0, 1], [2, 3]],
        "label_id": ["W1", "W2"], "entity": ["Acme", "Beta"],
        "label": ["dev description", "beta description"],
    })])
    kb = {r.entity_id: r.text for r in build_el4qa_kb(spark, [train, dev]).collect()}
    assert kb == {
        "W1": "Acme [SEP]train description",  # train (earlier path) wins
        "W2": "Beta [SEP]beta description",
    }


def test_write_links_tsv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "links")
    links = spark.createDataFrame(
        [("d1", 0, 5, "E1", 0.91), ("d2", 3, 9, "E7", 0.5)],
        "document_id string, start_index int, end_index int, entity_id string, score double",
    )
    write_links_tsv(links, p)
    back = spark.read.csv(p, sep="\t").collect()
    got = sorted(tuple(r) for r in back)
    assert got == [
        ("d1", "0", "5", "E1", "0.91", "NA"),
        ("d2", "3", "9", "E7", "0.5", "NA"),
    ]


def test_read_glove_json_values(spark, tmp_path):
    p = str(tmp_path / "glove.json")
    with open(p, "w") as f:
        json.dump({"the": [0.1, 0.2], "cat": [0.3, 0.4]}, f)
    got = {r.word: list(r.vec) for r in read_glove_json(spark, p).collect()}
    assert got == {"the": [0.1, 0.2], "cat": [0.3, 0.4]}


def test_candidates_json_sink_nesting(spark, tmp_path):
    cands = spark.createDataFrame(
        [
            ("d1", "m1", 2, "E2", "beta"),
            ("d1", "m1", 1, "E1", "alpha"),
            ("d1", "m2", 1, "E9", "gamma"),
            ("d2", "m3", 1, "E1", "alpha"),
        ],
        "document_id string, mention_id string, rank int, candidate_id string, text string",
    )
    nested = {r.document_id: r.mentions for r in candidates_json_rows(cands).collect()}
    m1 = nested["d1"]["m1"].all_candidates
    assert [c.candidate_id for c in m1] == ["E1", "E2"]  # rank order preserved
    assert nested["d2"]["m3"].all_candidates[0].text == "alpha"

    out = str(tmp_path / "cands")
    write_candidates_json(cands, out)
    lines = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            with open(os.path.join(out, fn)) as f:
                lines += [json.loads(line) for line in f if line.strip()]
    by_doc = {d["document_id"]: d["mentions"] for d in lines}
    assert by_doc["d1"]["m1"]["all_candidates"] == [
        {"candidate_id": "E1", "text": "alpha"},
        {"candidate_id": "E2", "text": "beta"},
    ]
