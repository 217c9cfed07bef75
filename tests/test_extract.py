"""EXTRACT stage: the byte-identical per-url invariant (BASELINE.md)."""

from pyspark.sql import functions as F

from e2e_el_spark.extract import extract_documents, extract_text
from e2e_el_spark.synth import gen_page, pages_df


def test_extract_pure_function_of_bytes():
    html = b"<html><head><title>T</title></head><body><p>a b</p><p>c</p></body></html>"
    assert extract_text(html) == "T\na b\nc"
    assert extract_text(html) == extract_text(bytearray(html))
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_extract_drops_script_style_comments():
    html = (b"<html><head><script>var x=1;</script><style>p{}</style>"
            b"<title>T</title></head><body><!-- hi --><p>ok &amp; fine</p></body></html>")
    assert extract_text(html) == "T\nok & fine"


def test_extract_invariant_local():
    for i in range(100):
        page = gen_page(42, i, 50)
        assert extract_text(page["html"]) == page["text"]


def test_extract_invariant_spark(spark):
    """100% of rows: extract_text(html) == stored text, byte-for-byte."""
    pages = pages_df(spark, 200, n_entities=50, seed=42, partitions=8)
    docs = extract_documents(pages)
    joined = pages.select(F.col("url").alias("document_id"), F.col("text").alias("expected")).join(
        docs, "document_id"
    )
    n = joined.count()
    mismatches = joined.filter(F.col("text") != F.col("expected")).count()
    assert n == 200
    assert mismatches == 0
