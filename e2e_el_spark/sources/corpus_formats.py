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
    """spark.read.text + (file, line_no, value) with line numbers PER FILE.

    The running-number window is partitioned by ``input_file_name()`` so a
    multi-file corpus parallelizes per file — an unpartitioned
    ``Window.orderBy`` would serialize the whole corpus through one task at
    scale. Within a file, monotonically_increasing_id preserves read order
    (file splits are enumerated by ascending offset).
    """
    df = spark.read.text(path).withColumn("file", F.input_file_name())
    w = Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
    return df.select("file", F.row_number().over(w).alias("line_no"), F.col("value"))


def _fcols(lines: DataFrame) -> list[str]:
    """Window partition columns: by file when the lines carry one (the
    multi-file scale path), else unpartitioned (single fixture)."""
    return ["file"] if "file" in lines.columns else []


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
    recipe), per file and prefixed with the file name when the input is
    multi-file so ids stay globally unique AND the window parallelizes.
    """
    fc = _fcols(lines)
    w = Window.partitionBy(*fc).orderBy("line_no")
    marked = lines.withColumn(
        "is_boundary",
        (F.trim(F.col("value")) == "") | F.col("value").startswith("-DOCSTART-"),
    ).withColumn(
        "_dnum", F.sum(F.when(F.col("is_boundary"), 1).otherwise(0)).over(w)
    )
    doc_id = (
        F.concat_ws("#", F.col("file"), F.col("_dnum").cast("string"))
        if fc
        else F.col("_dnum")
    )
    toks = marked.filter(~F.col("is_boundary")).select(
        doc_id.alias("doc_id"),
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
    ENTITY over following CANDIDATE lines (per file — ENTITY/CANDIDATE runs
    never straddle files), then collect."""
    fc = _fcols(lines)
    w = (
        Window.partitionBy(*fc).orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = lines.select(
        *fc,
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


def parse_aida(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """AIDA-YAGO2 TSV → (documents, mentions) (S7,
    `/root/reference/collectiveEL_data_formatter_AIDA.py:22-82`).

    Reference semantics replicated: ``-DOCSTART- (id)`` opens a document;
    each blank line closes a *sentence segment* which becomes its own
    document ``{doc}_{k}`` — but ONLY if it contains at least one linked
    mention, and the segment counter k advances only over emitted segments.
    ``--NME--`` (unlinkable) rows are plain words. Mention spans are B/I
    assembled; char offsets are positions in the space-joined word text.
    Columns: word, B/I, mention_text, entity_name, _, gold_id.

    Running windows are per file when the lines carry a ``file`` column —
    '-DOCSTART- (id)' headers carry corpus-unique doc ids, so downstream
    grouping needs no file prefix; only the fill-down/counter windows must
    not cross files.
    """
    fc = _fcols(lines)
    w_all = Window.partitionBy(*fc).orderBy("line_no")
    marked = (
        lines.withColumn("is_doc", F.col("value").startswith("-DOCSTART-"))
        .withColumn("is_blank", F.trim(F.col("value")) == "")
        .withColumn(
            "doc_id",
            F.last(
                F.when(F.col("is_doc"), F.regexp_extract("value", r"\((\d+[^)]*)\)", 1)),
                ignorenulls=True,
            ).over(w_all.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "sent_no",
            F.sum(F.when(F.col("is_blank") | F.col("is_doc"), 1).otherwise(0)).over(w_all),
        )
    )
    toks = marked.filter(~F.col("is_doc") & ~F.col("is_blank")).select(
        "line_no", "doc_id", "sent_no", F.split("value", "\t").alias("c")
    )
    toks = toks.select(
        "line_no", "doc_id", "sent_no",
        F.get("c", 0).alias("word"),
        F.when(
            (F.size("c") >= 2) & (F.element_at("c", -1) != "--NME--"), F.get("c", 1)
        ).alias("bio"),
        F.get("c", 2).alias("mention_text"),
        F.get("c", 3).alias("entity_name"),
        F.get("c", 5).alias("gold_id"),
    )
    ws = Window.partitionBy("doc_id", "sent_no").orderBy("line_no")
    toks = toks.withColumn(
        "start",
        F.coalesce(
            F.sum(F.length("word") + 1).over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int"),
    ).withColumn("end", (F.col("start") + F.length("word")).cast("int"))
    # consecutive B/I grouping within a sentence
    toks = toks.withColumn(
        "m_grp",
        F.sum(F.when(F.col("bio") == "B", 1).otherwise(0)).over(
            ws.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ment_toks = toks.filter(F.col("bio").isin("B", "I") & (F.col("m_grp") > 0))
    raw_mentions = ment_toks.groupBy("doc_id", "sent_no", "m_grp").agg(
        F.min("start").alias("start_index"),
        F.max("end").alias("end_index"),
        F.first("mention_text").alias("text"),
        F.first("entity_name").alias("entity_name"),
        F.first("gold_id").alias("label_candidate_id"),
    )
    # segments with ≥1 mention, numbered in emission order per document
    seg_w = Window.partitionBy("doc_id").orderBy("sent_no")
    segs = (
        raw_mentions.select("doc_id", "sent_no").distinct()
        .withColumn("segment_id", F.row_number().over(seg_w) - 1)
    )
    # word order restored via array_sort over (line_no, word) structs —
    # collect_list alone gives no ordering guarantee
    documents = (
        toks.join(segs, ["doc_id", "sent_no"])
        .groupBy("doc_id", "sent_no", "segment_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("text")
        )
        .select(
            F.concat_ws("_", "doc_id", "segment_id").alias("document_id"), "text",
            "doc_id", "sent_no",
        )
    )
    mw = Window.partitionBy("doc_id", "sent_no").orderBy("start_index")
    mentions = (
        raw_mentions.join(segs, ["doc_id", "sent_no"])
        .withColumn("_k", F.row_number().over(mw) - 1)
        .select(
            F.concat_ws("_", "doc_id", "segment_id", "_k").alias("mention_id"),
            F.concat_ws("_", "doc_id", "segment_id").alias("document_id"),
            "start_index", "end_index", "text",
            F.lit("N/A").alias("type"),
            "label_candidate_id",
            "entity_name",
        )
    )
    return documents.select("document_id", "text"), mentions
