"""Corpus-format parsers (S5/S6/S10) + id normalization (P5) vs the
reference's documented semantics."""

from pyspark.sql import functions as F

from e2e_el_spark.sources.corpus_formats import (
    bio_to_spans,
    normalize_entity_ids,
    parse_candidate_dict,
    parse_conll,
    parse_pubtator,
)


def _lines(spark, rows):
    return spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(rows)], "line_no int, value string"
    )


def test_parse_pubtator(spark):
    lines = _lines(spark, [
        "101|t|Cystic fibrosis",
        "101|a|A disease of the lungs.",
        "101\t0\t15\tCystic fibrosis\tDisease\tD003550",
        "101\t2\t9\tstic fi\tDisease\tD999",
        "malformed\trow",
        "202|t|Another title",
        "202|a|Another abstract.",
    ])
    docs, mentions = parse_pubtator(lines)
    d = {r.document_id: r.text for r in docs.collect()}
    # title + ' ' + abstract concat (el_data_formatter.py:27-29)
    assert d["101"] == "Cystic fibrosis A disease of the lungs."
    assert d["202"] == "Another title Another abstract."
    m = mentions.collect()
    assert len(m) == 2  # malformed row dropped (P3 len==6 filter)
    first = [r for r in m if r.start_index == 0][0]
    assert (first.text, first.label_candidate_id) == ("Cystic fibrosis", "D003550")
    # span invariant against the reconstructed doc text
    assert d["101"][first.start_index:first.end_index] == first.text


def test_parse_conll_and_bio_spans(spark):
    lines = _lines(spark, [
        "-DOCSTART- (1)",
        "John B-PER",
        "Smith I-PER",
        "visited O",
        "Paris B-LOC",
        "",
        "Acme B-ORG",
        "rocks O",
    ])
    toks = parse_conll(lines)
    got = [(r.doc_id, r.pos, r.token, r.tag) for r in toks.orderBy("doc_id", "pos").collect()]
    assert got == [
        (1, 0, "John", "B-PER"), (1, 1, "Smith", "I-PER"), (1, 2, "visited", "O"),
        (1, 3, "Paris", "B-LOC"), (2, 0, "Acme", "B-ORG"), (2, 1, "rocks", "O"),
    ]
    spans = {(r.doc_id, r.start_pos, r.end_pos): (r.type, r.text) for r in bio_to_spans(toks).collect()}
    assert spans == {
        (1, 0, 1): ("PER", "John Smith"),
        (1, 3, 3): ("LOC", "Paris"),
        (2, 0, 0): ("ORG", "Acme"),
    }


def test_bio_spans_iob_repair(spark):
    # I- after O starts a new span (standard IOB repair)
    lines = _lines(spark, ["w1 O", "w2 I-X", "w3 I-X", "w4 I-Y"])
    toks = parse_conll(lines)
    spans = {(r.start_pos, r.end_pos): r.type for r in bio_to_spans(toks).collect()}
    assert spans == {(1, 2): "X", (3, 3): "Y"}


def test_parse_candidate_dict(spark):
    lines = _lines(spark, [
        "ENTITY Japan",
        "CANDIDATE E1",
        "CANDIDATE E2",
        "ENTITY Tokyo",
        "CANDIDATE E9",
    ])
    got = {r.mention_text: r.candidate_ids for r in parse_candidate_dict(lines).collect()}
    assert got == {"Japan": ["E1", "E2"], "Tokyo": ["E9"]}


def test_normalize_entity_ids(spark):
    df = spark.createDataFrame(
        [("UMLS:C123",), ("MESH:D1+D2",), ("E1|E2",), ("plain",)], "entity_id string"
    )
    got = [r.entity_id for r in normalize_entity_ids(df).collect()]
    assert got == ["C123", "D1", "E1", "plain"]
