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


EL4QA_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("mentions", T.ArrayType(T.ArrayType(T.IntegerType()))),
    T.StructField("label_id", T.ArrayType(T.StringType())),   # Wikipedia ID
    T.StructField("entity", T.ArrayType(T.StringType())),     # entity name
    T.StructField("label", T.ArrayType(T.StringType())),      # description
])


def read_el4qa_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S8: question EL rows with [[start,end],...] spans and parallel
    label_id/entity/label arrays (`/root/reference/utils_EL4QA.py:13-43`)
    → one row per mention via posexplode."""
    raw = spark.read.schema(EL4QA_SCHEMA).json(path)
    return raw.select(
        F.col("id").alias("question_id"),
        "text",
        F.posexplode("mentions").alias("mention_idx", "span"),
        F.col("label_id"),
        F.col("entity"),
    ).select(
        "question_id",
        "text",
        "mention_idx",
        F.get("span", 0).alias("start_index"),
        F.get("span", 1).alias("end_index"),
        F.element_at("label_id", F.col("mention_idx") + 1).alias("label_candidate_id"),
        F.element_at("entity", F.col("mention_idx") + 1).alias("entity_name"),
    )


def build_el4qa_kb(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S8 KB construction: union of entity descriptions across the splits,
    first-occurrence-wins, text = ``entity + ' [SEP]' + description``
    (`/root/reference/utils_EL4QA.py:15-26` — the reference iterates
    train/test/dev in order and keeps the first description per label_id).

    Distributed first-wins: each path gets its position in ``paths`` as the
    priority; per entity_id the (lowest-priority, then lexicographically
    smallest text) row survives — deterministic under any partitioning.
    Returns (entity_id, text).
    """
    from pyspark.sql import Window

    parts = []
    for prio, path in enumerate(paths):
        raw = spark.read.schema(EL4QA_SCHEMA).json(path)
        parts.append(
            raw.select(
                F.posexplode(F.arrays_zip("label_id", "entity", "label")).alias("_i", "z"),
            ).select(
                F.col("z.label_id").alias("entity_id"),
                F.concat_ws(" [SEP]", F.col("z.entity"), F.col("z.label")).alias("text"),
                F.lit(prio).alias("_prio"),
            )
        )
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    w = Window.partitionBy("entity_id").orderBy("_prio", "text")
    return (
        allrows.filter(F.col("entity_id").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("entity_id", "text")
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


def candidates_json_rows(cands: DataFrame) -> DataFrame:
    """Nest flat candidate rows into the reference's per-doc/per-mention
    candidate structure (`/root/reference/candidate_selection.py:200-216`:
    ``mentions[doc][mention]['all_candidates'] = [{candidate_id, text}...]``).

    Input: (document_id, mention_id, rank, candidate_id, text) — one row per
    candidate. Output: one row per document with a ``mentions`` map of
    mention_id → {all_candidates: [...]} structs, candidates ordered by rank.
    """
    per_mention = (
        cands.groupBy("document_id", "mention_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rank", "candidate_id", "text"))
                ),
                lambda s: F.struct(
                    s["candidate_id"].alias("candidate_id"), s["text"].alias("text")
                ),
            ).alias("all_candidates")
        )
    )
    return per_mention.groupBy("document_id").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("mention_id"),
                        F.struct(F.col("all_candidates").alias("all_candidates")),
                    )
                )
            )
        ).alias("mentions")
    )


def write_candidates_json(cands: DataFrame, path: str) -> None:
    """S13/TF-IDF candidate interchange sink: one JSON object PER DOCUMENT
    per line — ``{"document_id": ..., "mentions": {mid: {"all_candidates":
    [{"candidate_id", "text"}, ...]}}}``.

    The reference dumps the whole corpus as ONE json dict
    (candidate_selection.py:213-216) — a driver-memory artifact; at scale the
    per-document JSONL shape streams and partitions, and concatenating the
    lines reproduces the reference content exactly (same nesting below the
    document key).
    """
    candidates_json_rows(cands).write.mode("overwrite").json(path)


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
