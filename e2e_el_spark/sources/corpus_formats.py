"""Line-oriented corpus format parsers (SURVEY.md §2.1 S5/S6/S10) as
DataFrame transforms — regexp + window functions, no driver-side parsing.

Each parser takes a DataFrame of raw lines with a ``line_no`` ordering column
(build one with :func:`lines_df`), so the input can come from
``spark.read.text`` on a real file or from a test fixture alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def lines_df(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.text + a stable line number per file.

    zipWithIndex-free: uses (file, offset) ordering via
    monotonically_increasing_id *only for ordering within a read*, which is
    stable for a single text file read. For multi-file corpora pass an
    explicit line_no column instead.
    """
    df = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    return df.select(F.row_number().over(w).alias("line_no"), F.col("value"))


def parse_pubtator(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PubTator corpus → (documents, mentions) (S5,
    `/root/reference/el_data_formatter.py:7-41`).

    ``docid|t|title`` / ``docid|a|abstract`` lines concatenate to the doc
    text as title + ' ' + abstract; 6-column TSV lines are mentions
    (doc_id, start, end, text, type, gold_id). Malformed lines (not header,
    not 6 cols) are dropped — the reference's len(cols)==6 filter (P3).
    """
    header = lines.filter(F.col("value").rlike(r"^[^\t|]+\|[ta]\|"))
    parts = header.select(
        F.regexp_extract("value", r"^([^|]+)\|([ta])\|(.*)$", 1).alias("document_id"),
        F.regexp_extract("value", r"^([^|]+)\|([ta])\|(.*)$", 2).alias("kind"),
        F.regexp_extract("value", r"^([^|]+)\|([ta])\|(.*)$", 3).alias("part_text"),
    )
    documents = (
        parts.groupBy("document_id")
        .agg(
            F.concat_ws(
                " ",
                F.max(F.when(F.col("kind") == "t", F.col("part_text"))),
                F.max(F.when(F.col("kind") == "a", F.col("part_text"))),
            ).alias("text")
        )
    )
    cols = F.split(F.col("value"), "\t")
    mentions = (
        lines.filter(~F.col("value").rlike(r"^[^\t|]+\|[ta]\|"))
        .select(cols.alias("c"))
        .filter(F.size("c") == 6)  # P3: well-formed 6-column rows only
        .select(
            F.col("c").getItem(0).alias("document_id"),
            F.col("c").getItem(1).cast("int").alias("start_index"),
            F.col("c").getItem(2).cast("int").alias("end_index"),
            F.col("c").getItem(3).alias("text"),
            F.col("c").getItem(4).alias("type"),
            F.col("c").getItem(5).alias("label_candidate_id"),
        )
    )
    return documents, mentions


def parse_conll(lines: DataFrame) -> DataFrame:
    """CoNLL token-per-line TSV → (doc_id, pos, token, tag) (S6,
    `/root/reference/utils_ner.py:53-77`).

    Document boundaries = blank lines or -DOCSTART- headers; doc_id is the
    running count of boundaries seen (window cumulative sum — the SURVEY S6
    recipe).
    """
    w = Window.orderBy("line_no")
    marked = lines.withColumn(
        "is_boundary",
        (F.trim(F.col("value")) == "") | F.col("value").startswith("-DOCSTART-"),
    ).withColumn(
        "doc_id", F.sum(F.when(F.col("is_boundary"), 1).otherwise(0)).over(w)
    )
    toks = marked.filter(~F.col("is_boundary")).select(
        "doc_id",
        "line_no",
        F.split(F.col("value"), r"\s+").getItem(0).alias("token"),
        F.element_at(F.split(F.col("value"), r"\s+"), -1).alias("tag"),
    )
    wd = Window.partitionBy("doc_id").orderBy("line_no")
    return toks.withColumn("pos", F.row_number().over(wd) - 1).drop("line_no")


def bio_to_spans(tokens: DataFrame) -> DataFrame:
    """BIO tag sequence → entity spans (N2-analog as pure window ops,
    reference decode loop `/root/reference/run_E2E_exhaustive.py:383-447`).

    tokens: (doc_id, pos, token, tag) with tags O / B-X / I-X. A span starts
    at B-* (or I-* after O/different-type — the standard IOB repair), and
    extends over following I-* of the same type. Returns
    (doc_id, start_pos, end_pos, type, text).
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    t = (
        tokens.withColumn("bio", F.substring("tag", 1, 1))
        .withColumn("etype", F.regexp_replace("tag", r"^[BI]-", ""))
        .withColumn("prev_bio", F.lag("bio").over(w))
        .withColumn("prev_type", F.lag("etype").over(w))
    )
    t = t.withColumn(
        "starts",
        (F.col("bio") == "B")
        | ((F.col("bio") == "I") & ((F.col("prev_bio").isNull()) | (F.col("prev_bio") == "O") | (F.col("prev_type") != F.col("etype")))),
    )
    t = t.withColumn(
        "span_id",
        F.sum(F.when(F.col("starts"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ent = t.filter(F.col("bio") != "O")
    return (
        ent.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("start_pos"),
            F.max("pos").alias("end_pos"),
            F.first("etype").alias("type"),
            F.concat_ws(" ", F.collect_list("token")).alias("text"),
        )
        .drop("span_id")
    )


def parse_candidate_dict(lines: DataFrame) -> DataFrame:
    """AIDA ENTITY/CANDIDATE line pairs → (mention_text, candidate_ids) (S10,
    `/root/reference/mention_candidates_AIDA.py:14-31`): fill-down the last
    ENTITY over following CANDIDATE lines, then collect."""
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    tagged = lines.select(
        "line_no",
        F.when(
            F.col("value").startswith("ENTITY"),
            F.regexp_extract("value", r"ENTITY\s+(\S+)", 1),
        ).alias("mention_text"),
        F.when(
            F.col("value").startswith("CANDIDATE"),
            F.regexp_extract("value", r"CANDIDATE\s+(\S+)", 1),
        ).alias("candidate_id"),
    )
    filled = tagged.withColumn(
        "mention_text", F.last("mention_text", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("candidate_id").isNotNull())
        .groupBy("mention_text")
        .agg(F.collect_list("candidate_id").alias("candidate_ids"))
    )


def normalize_entity_ids(df: DataFrame, id_col: str = "entity_id") -> DataFrame:
    """Id-normalization projections (P5): strip UMLS:/MESH:/OMIM: prefixes,
    split composite gold ids on + or | keeping the first
    (`/root/reference/candidate_selection_ncbi.py:31-34,62-67`,
    `/root/reference/utils_FullTransformer.py:334-338`)."""
    first = F.split(F.col(id_col), r"[+|]").getItem(0)
    stripped = F.regexp_replace(first, r"^(UMLS:|MESH:|OMIM:)", "")
    return df.withColumn(id_col, stripped)
