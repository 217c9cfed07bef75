"""Physical-plan assertions: the optimizations SURVEY.md §4 promises must be
visible in explain() output — pushdown, pruning, broadcast, codegen."""

from pyspark.sql import functions as F

from e2e_el_spark.extract import extract_documents
from e2e_el_spark.operators.mentions import detect_mentions
from e2e_el_spark.synth import aliases_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_to_parquet(spark, tmp_path):
    p = str(tmp_path / "li")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("x").alias("s")
    ).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("k") > 50).select("k")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,50)]" in plan, plan
    # column pruning: v and s never read
    assert "ReadSchema: struct<k:bigint>" in plan, plan


def test_extract_prunes_stored_text_column(spark, tmp_path):
    """EXTRACT must read only (url, html) — the stored text column is the
    oracle, not an input (extract.py docstring contract)."""
    p = str(tmp_path / "pages")
    spark.createDataFrame(
        [("u1", b"<p>x</p>", "x", "en")], "url string, html binary, text string, lang string"
    ).write.parquet(p)
    docs = extract_documents(spark.read.parquet(p))
    plan = _plan(docs)
    assert "text" not in plan.split("ReadSchema:")[1].split("\n")[0], plan
    assert "url" in plan and "html" in plan


def test_gazetteer_join_is_broadcast(spark):
    docs = spark.createDataFrame([("d1", "alpha beta")], "document_id string, text string")
    gaz = aliases_df(spark, 20, seed=42)
    plan = _plan(detect_mentions(docs, gaz, span_mode="window"))
    assert "BroadcastHashJoin" in plan, plan


def test_fused_detector_plan_has_no_pre_scan_exchange(spark):
    """The fused matcher's contract is structural: detection runs INSIDE the
    document scan (MapInPandas directly over the source, no token shuffle,
    no span explode, no join), and the only exchanges in the whole stage
    sit ABOVE it, carrying matched-mention rows (longest-match window +
    mention_id dedup)."""
    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma")], "document_id string, text string"
    )
    gaz = aliases_df(spark, 20, seed=42)
    plan = _plan(detect_mentions(docs, gaz, span_mode="fused"))
    assert "MapInPandas" in plan, plan
    # nothing below the python scan: no join, no explode/generate anywhere
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan
    below_scan = plan.split("MapInPandas")[-1]
    assert "Exchange" not in below_scan, plan


def test_anchor_pruned_window_form_gates_explode_on_anchor_join(spark):
    """anchor_prune=True (window mode): the broadcast anchor join must sit
    BETWEEN the token window pass and the span explode, so the 1..k row
    expansion happens only for anchor tokens."""
    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma")], "document_id string, text string"
    )
    gaz = aliases_df(spark, 20, seed=42)
    plan = _plan(
        detect_mentions(docs, gaz, span_mode="window", anchor_prune=True)
    )
    # the anchor dim is broadcast-joined on the lowered token...
    assert "_anchor_first" in plan and "BroadcastHashJoin [lower(token" in plan, plan
    # ...and every span variant inside the explode is width-gated
    span_explode = next(
        s for s in plan.split("+- Generate") if "start_index" in s.split("\n")[0]
    )
    head = span_explode.split("\n")[0]
    assert "array_contains(_anchor_widths" in head, head


def test_vocab_topk_is_distributed(spark):
    """build_tfidf_vocab's top-k must compile to TakeOrderedAndProject
    (per-partition heaps), NOT a single-partition row_number window — an
    unpartitioned window funnels the whole gram table through one task."""
    from e2e_el_spark.operators.blocking import build_tfidf_vocab

    corpus = spark.createDataFrame(
        [(str(i), f"alpha beta gamma {i}") for i in range(50)], "cid string, ctext string"
    )
    vocab = build_tfidf_vocab(corpus, "cid", "ctext", n_max=2, vocab_size=10, n_docs=50)
    plan = _plan(vocab)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    # no single-partition shuffle of the totals table
    assert "SinglePartition" not in plan, plan


def test_candidate_rescore_broadcasts_kb_vectors(spark):
    """The exact-rescore join's entity-vector side (the KB dimension) must
    be a BroadcastHashJoin — a sort-merge join there would shuffle the wide
    cands × grams intermediate on (entity_id, gram)."""
    from e2e_el_spark.pipeline import PipelineConfig, candidate_pairs
    from e2e_el_spark.synth import aliases_df, entities_df

    ents = entities_df(spark, 30, seed=5)
    mentions = aliases_df(spark, 30, seed=5).select(
        F.concat_ws("#", "entity_id", "alias").alias("mention_id"),
        F.col("alias").alias("text"),
    )
    out = candidate_pairs(mentions, ents, PipelineConfig(vocab_size=500))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan


def test_aggregation_uses_whole_stage_codegen_and_partial_agg(spark, tmp_path):
    p = str(tmp_path / "agg")
    spark.range(1000).select((F.col("id") % 7).alias("k"), F.col("id").alias("v")).write.parquet(p)
    df = spark.read.parquet(p).groupBy("k").agg(F.sum("v").alias("s"))
    df.collect()  # AQE finalizes the physical plan only on execution
    plan = _plan(df)
    # partial (map-side) aggregation before the exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_sum" in plan, plan
    # whole-stage codegen visible on the finalized formatted plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    # '*' prefix / 'codegen id' mark whole-stage-codegen'd operators
    assert "codegen id" in buf.getvalue() or "WholeStageCodegen" in buf.getvalue(), buf.getvalue()


def test_kb_broadcast_hint_dropped_past_threshold(spark):
    """Round-5: above cfg.broadcast_kb_max_entities the KB-proportional
    frames (entity vectors, entity blocks, alias names) must lose their
    forced broadcast hints — a 10^6-entity KB through F.broadcast is a
    silent memory bet. The hint (not the runtime strategy, which AQE may
    still pick from actual tiny test sizes) is the assertable plan fact."""
    from e2e_el_spark.pipeline import PipelineConfig, candidate_pairs, score_candidates
    from e2e_el_spark.synth import aliases_df, entities_df

    cfg = PipelineConfig()
    ents = entities_df(spark, 30, seed=5)
    gaz = aliases_df(spark, 30, seed=5)
    mentions = gaz.select(
        F.col("alias").alias("mention_id"), F.col("alias").alias("text")
    )

    def hint_count(df):
        return _optimized(df).count("strategy=broadcast")

    def hint_lines(df):
        return [
            line.strip() for line in _optimized(df).splitlines()
            if "strategy=broadcast" in line
        ]

    small = candidate_pairs(mentions, ents, cfg, n_entities=30)
    big = candidate_pairs(mentions, ents, cfg, n_entities=10**9)
    # In the small plan the KB-proportional entity-vector frame is broadcast
    # into the rescore joins (Inner/LeftOuter hints). In the big plan those
    # must be gone: the ONLY surviving broadcast hints are the vocab-bounded
    # gram-hash sides of LeftSemi prune joins (<= cfg.vocab_size 8-byte
    # hashes each — the R5-g evh prunes and the sv_r known-gram filter).
    assert any("LeftSemi" not in line for line in hint_lines(small)), (
        hint_lines(small)
    )
    big_hints = hint_lines(big)
    assert big_hints, "vocab-bounded prune broadcasts must survive"
    assert all("Join LeftSemi" in line for line in big_hints), big_hints

    cands = small.limit(5)
    s_small = score_candidates(cands, mentions, ents, cfg, gaz, n_entities=30)
    s_big = score_candidates(cands, mentions, ents, cfg, gaz, n_entities=10**9)
    assert hint_count(s_big) < hint_count(s_small)


def test_kb_scale_plan_decisions_output_invariant(spark, tmp_path):
    """Forcing the large-KB plan paths (shuffle KB joins + window-mode
    detection fallback) on a small input must give bit-identical clusters
    to the default broadcast/fused paths — plan decisions are performance
    only."""
    from e2e_el_spark.pipeline import PipelineConfig, run_pipeline
    from e2e_el_spark.synth import aliases_df, entities_df, pages_df

    pages = pages_df(spark, 60, n_entities=30, seed=11, partitions=4)
    ents = entities_df(spark, 30, seed=11)
    gaz = aliases_df(spark, 30, seed=11)
    base = run_pipeline(spark, pages, ents, gaz, str(tmp_path / "a"))
    big_kb_cfg = PipelineConfig(broadcast_kb_max_entities=0, fused_max_aliases=0)
    alt = run_pipeline(spark, pages, ents, gaz, str(tmp_path / "b"), big_kb_cfg)

    def key(df):
        return sorted((r.mention_id, r.cluster_id) for r in df.collect())

    assert key(base) == key(alt)


def test_shuffles_start_data_proportional_then_coalesce(spark):
    """Shuffle exchanges start from max(4 x shuffle.partitions, 64) and AQE
    coalesces small ones down — the R5-m fix: a big exchange is never pinned
    to the emulated core count (at partitions = cores the n2 level pushed
    ~27M link rows through TWO partitions and 06_clusters degraded 21% from
    spill; BENCH/SCALING_EVIDENCE.md R5-l/R5-m), while tiny KB-bounded
    stages still coalesce instead of paying per-task overhead."""
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    init = int(
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    )
    assert init == max(4 * sp, 64), (sp, init)
    # AQE still coalesces a tiny aggregation far below the initial count
    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    assert df.rdd.getNumPartitions() < init
