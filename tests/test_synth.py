"""Synthetic corpus: purity, invariants, schema (FIXTURES.md)."""

from e2e_el_spark.extract import extract_text
from e2e_el_spark.synth import (
    entity_aliases,
    entity_catalog,
    gen_page,
    gold_mentions_df,
    pages_df,
)


def test_gen_page_pure():
    a = gen_page(42, 5, 100)
    b = gen_page(42, 5, 100)
    assert a == b
    assert gen_page(43, 5, 100) != a


def test_invariants_hold():
    for i in range(50):
        p = gen_page(42, i, 100)
        assert extract_text(p["html"]) == p["text"]
        for m in p["mentions"]:
            assert p["text"][m["start_index"] : m["end_index"]] == m["text"]


def test_catalog_unique_names():
    cat = entity_catalog(42, 300)
    names = [c["name"] for c in cat]
    assert len(set(names)) == len(names)
    # no alias is shared by two entities (the trailing numeral disambiguates);
    # duplicates WITHIN an entity are fine (typo swap of equal chars)
    owner: dict[str, int] = {}
    for e in range(300):
        for a in entity_aliases(42, e):
            assert owner.setdefault(a, e) == e, (a, e, owner[a])


def test_spark_builders_schema(spark):
    pages = pages_df(spark, 10, n_entities=20, seed=42, partitions=2)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert pages.count() == 10
    gold = gold_mentions_df(spark, 10, n_entities=20, seed=42, partitions=2)
    assert gold.count() > 0
    assert "label_candidate_id" in gold.columns
