"""JSONL / TSV readers & writers (SURVEY.md §2.1 S2-S4, S8-S9, S12-S14).

Thin, schema-explicit wrappers over spark.read/write — the reference parses
these formats with per-line json.loads / split('\t'); here Catalyst gets a
declared schema (no inference jobs, full pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("document_id", T.StringType()),
    T.StructField("text", T.StringType()),
])

MENTION_SCHEMA = T.StructType([
    T.StructField("mention_id", T.StringType()),
    T.StructField("start_index", T.IntegerType()),
    T.StructField("end_index", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("content_document_id", T.StringType()),
    T.StructField("label_candidate_id", T.StringType()),
    T.StructField("tfidf_candidates", T.ArrayType(T.StringType())),
])


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S2: one {"document_id", "text"} object per line
    (`/root/reference/utils_E2E_exhaustive.py:32-39`)."""
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


def read_mentions_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: layout A — one mention object per line
    (`/root/reference/utils_DualEncoder.py:36-42`)."""
    return spark.read.schema(MENTION_SCHEMA).json(path)


def read_mentions_collective_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S4: layout B — one JSON *array* of mention structs per line =
    all mentions of one document (`/root/reference/utils_E2E_exhaustive.py:42-56`).
    Read as array + explode back to the flat layout-A schema."""
    arr = T.ArrayType(MENTION_SCHEMA)
    raw = spark.read.text(path)
    return (
        raw.select(F.explode(F.from_json(F.col("value"), arr)).alias("m"))
        .select("m.*")
    )


def read_el4qa_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S8: question EL rows with [[start,end],...] spans
    (`/root/reference/utils_EL4QA.py:13-43`) → one row per mention via
    posexplode."""
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("mentions", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("wikidata_id", T.ArrayType(T.StringType())),
        T.StructField("entity", T.ArrayType(T.StringType())),
        T.StructField("label", T.ArrayType(T.StringType())),
    ])
    raw = spark.read.schema(schema).json(path)
    return raw.select(
        F.col("id").alias("question_id"),
        "text",
        F.posexplode("mentions").alias("mention_idx", "span"),
        F.col("wikidata_id"),
        F.col("entity"),
    ).select(
        "question_id",
        "text",
        "mention_idx",
        F.col("span").getItem(0).alias("start_index"),
        F.col("span").getItem(1).alias("end_index"),
        F.element_at("wikidata_id", F.col("mention_idx") + 1).alias("label_candidate_id"),
        F.element_at("entity", F.col("mention_idx") + 1).alias("entity_name"),
    )


def read_bm25_candidates(spark: SparkSession, path: str) -> DataFrame:
    """S9: TSV `entity_id \\t comma-joined candidate ids`
    (`/root/reference/data/MM_full_CUI/candidate_entities_BM25.txt`)."""
    raw = spark.read.csv(path, sep="\t", schema="entity_id string, cands string")
    return raw.select("entity_id", F.split("cands", ",").alias("candidate_ids"))


def read_glove_json(spark: SparkSession, path: str) -> DataFrame:
    """S14: word → vector JSON map (`/root/reference/LATTE/utils_LATTE.py:129-138`)
    as a broadcastable (word, vec) dimension table."""
    raw = spark.read.json(path, multiLine=True)
    cols = raw.columns
    stack = ", ".join(f"'{c}', `{c}`" for c in cols)
    return raw.selectExpr(f"stack({len(cols)}, {stack}) as (word, vec)")


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """S13 (`/root/reference/el_data_formatter.py:69-73`)."""
    df.select("document_id", "text").write.mode("overwrite").json(path)


def write_links_tsv(links: DataFrame, path: str) -> None:
    """S12 gold/pred sink: `doc \\t start \\t end \\t entity \\t score \\t NA`
    (`/root/reference/run_E2E_exhaustive.py:521-523,584-611`)."""
    links.select(
        F.col("document_id"),
        F.col("start_index").cast("string"),
        F.col("end_index").cast("string"),
        F.col("entity_id"),
        F.col("score").cast("string"),
        F.lit("NA"),
    ).write.mode("overwrite").option("sep", "\t").csv(path)
