"""The flagship end-to-end pipeline (SURVEY.md §7.1):

    pages → EXTRACT → documents → MENTIONS → BLOCK → PAIRS → LINKS → CLUSTER

Each stage is a checkpointed table (``lineage.StageRunner``) so a killed run
resumes mid-pipeline. The KB (entities/gazetteer) is a broadcast dimension at
every join site (the reference's loop-invariant "embed the KB once" hoist,
`/root/reference/run_DualEncoder.py:306-322`, becomes ``F.broadcast``).

Link semantics mirror the reference: per-mention argmax candidate above a
threshold (`/root/reference/run_E2E_exhaustive.py:536-544,570-575` — sigmoid-γ
pruning + top-1), then clusters = connected components over the match graph,
which reproduces "two mentions co-cluster iff linked to the same entity"
(SURVEY.md §2.12).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_el_spark.extract import extract_documents
from e2e_el_spark.lineage import StageRunner
from e2e_el_spark.metrics import labeled_same_block_pairs, pairwise_f1
from e2e_el_spark.operators.blocking import (
    cosine_topk,
    build_tfidf_vocab,
    lsh_band_keys,
    minhash_signatures,
    sparse_pair_scores,
    tfidf_vectors,
    token_prefix_key,
)
from e2e_el_spark.operators.clustering import cluster_nodes
from e2e_el_spark.operators.mentions import detect_mentions
from e2e_el_spark.operators.scoring import score_pairs


@dataclass
class PipelineConfig:
    tfidf_topk: int = 10
    vocab_size: int = 100_000
    ngram_max: int = 5
    compat_ngrams: bool = True
    prefix_len: int = 4
    lsh_hashes: int = 32
    lsh_bands: int = 8
    lsh_rows_per_band: int = 4
    link_threshold: float = 0.55
    max_mention_tokens: int = 4
    weights: dict = field(
        default_factory=lambda: {"jw": 0.35, "tfidf_cos": 0.3, "emb_dot": 0.35}
    )


def mention_block_keys(mentions: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(mention_id, block_key): token-prefix key ∪ MinHash-LSH band keys."""
    prefix = mentions.select(
        "mention_id", token_prefix_key("text", cfg.prefix_len).alias("block_key")
    )
    sigs = minhash_signatures(mentions, "mention_id", "text", cfg.lsh_hashes)
    bands = lsh_band_keys(sigs, "mention_id", cfg.lsh_bands, cfg.lsh_rows_per_band)
    return prefix.unionByName(bands)


def entity_block_keys(entities: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(entity_id, block_key) over canonical names — same key functions."""
    prefix = entities.select(
        "entity_id", token_prefix_key("name", cfg.prefix_len).alias("block_key")
    )
    sigs = minhash_signatures(entities, "entity_id", "name", cfg.lsh_hashes)
    bands = lsh_band_keys(sigs, "entity_id", cfg.lsh_bands, cfg.lsh_rows_per_band)
    return prefix.unionByName(bands)


def candidate_pairs(
    mentions: DataFrame, entities: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """BLOCK + PAIRS: (mention_id, entity_id, tfidf_cos).

    Candidates = (token-prefix blocks ∪ LSH-band blocks ∪ TF-IDF top-k),
    each with its exact TF-IDF cosine attached (0 when no vocabulary gram is
    shared). The entity side of every block join is broadcast — the KB is the
    small dimension (SURVEY.md §1.3).
    """
    vocab = build_tfidf_vocab(
        entities.select(F.col("entity_id").alias("cid"), F.col("name").alias("ctext")).unionByName(
            mentions.select(F.col("mention_id").alias("cid"), F.col("text").alias("ctext"))
        ),
        "cid", "ctext", cfg.ngram_max, cfg.vocab_size, cfg.compat_ngrams,
    )
    ev = tfidf_vectors(entities, "entity_id", "name", vocab, cfg.ngram_max, cfg.compat_ngrams)
    mv = tfidf_vectors(mentions, "mention_id", "text", vocab, cfg.ngram_max, cfg.compat_ngrams)

    scores = sparse_pair_scores(mv, "mention_id", ev, "entity_id")
    w = Window.partitionBy("mention_id").orderBy(F.desc("tfidf_cos"), F.asc("entity_id"))
    topk = (
        scores.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cfg.tfidf_topk)
        .select("mention_id", "entity_id")
    )

    mb = mention_block_keys(mentions, cfg)
    eb = entity_block_keys(entities, cfg)
    blocked = mb.join(F.broadcast(eb), "block_key").select("mention_id", "entity_id")

    cands = blocked.unionByName(topk).dropDuplicates(["mention_id", "entity_id"])
    return cands.join(F.broadcast(scores), ["mention_id", "entity_id"], "left").select(
        "mention_id", "entity_id", F.coalesce("tfidf_cos", F.lit(0.0)).alias("tfidf_cos")
    )


def score_candidates(
    cands: DataFrame, mentions: DataFrame, entities: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Attach surfaces, run the vectorized scoring UDFs, combine weights."""
    pairs = (
        cands.join(mentions.select("mention_id", F.col("text").alias("text_a")), "mention_id")
        .join(
            F.broadcast(entities.select("entity_id", F.col("name").alias("text_b"))),
            "entity_id",
        )
    )
    return score_pairs(pairs, "text_a", "text_b", "tfidf_cos", cfg.weights)


def link_top1(scored: DataFrame, threshold: float) -> DataFrame:
    """Per-mention argmax entity with score ≥ threshold (P7 + T5)."""
    w = Window.partitionBy("mention_id").orderBy(F.desc("score"), F.asc("entity_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("score") >= threshold))
        .select("mention_id", "entity_id", "score")
    )


def clusters_from_links(links: DataFrame, mentions: DataFrame) -> DataFrame:
    """Connected components over the bipartite mention–entity match graph;
    unlinked mentions become singleton clusters."""
    edges = links.select(
        F.col("mention_id").alias("src_key"),
        F.concat(F.lit("ENT:"), F.col("entity_id")).alias("dst_key"),
    )
    assign = cluster_nodes(edges, all_nodes=mentions.select(F.col("mention_id").alias("node_key")))
    return (
        assign.join(
            mentions.select(F.col("mention_id").alias("node_key")), "node_key", "left_semi"
        )
        .select(F.col("node_key").alias("mention_id"), "cluster_id")
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    entities: DataFrame,
    gazetteer: DataFrame,
    workdir: str,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """pages → clusters(mention_id, document_id, start_index, end_index,
    text, cluster_id), with every stage checkpointed under ``workdir``."""
    cfg = cfg or PipelineConfig()
    runner = StageRunner(spark, workdir)

    documents = runner.run("01_extract", lambda: extract_documents(pages))
    mentions = runner.run(
        "02_mentions", lambda: detect_mentions(documents, gazetteer, cfg.max_mention_tokens)
    )
    cands = runner.run("03_pairs", lambda: candidate_pairs(mentions, entities, cfg))
    scored = runner.run(
        "04_scored", lambda: score_candidates(cands, mentions, entities, cfg)
    )
    links = runner.run("05_links", lambda: link_top1(scored, cfg.link_threshold))
    clusters = runner.run(
        "06_clusters",
        lambda: clusters_from_links(links, mentions).join(
            mentions.select("mention_id", "document_id", "start_index", "end_index", "text"),
            "mention_id",
        ).select("mention_id", "document_id", "start_index", "end_index", "text", "cluster_id"),
    )
    return clusters


def evaluate_pipeline(
    clusters: DataFrame, gold_mentions: DataFrame, cfg: PipelineConfig | None = None
) -> dict:
    """Pairwise F1 on labeled same-blocking-key pairs (BASELINE.json metric).

    Blocking key for the labeled-pair oracle = the token-prefix key of the
    gold surface (the pairs a single blocking bucket would compare).
    """
    cfg = cfg or PipelineConfig()
    blocked = gold_mentions.select(
        "mention_id",
        "label_candidate_id",
        token_prefix_key("text", cfg.prefix_len).alias("block_key"),
    )
    labeled = labeled_same_block_pairs(blocked)
    # gold mention ids differ from detected mention ids; re-key detected
    # clusters by (document_id, start, end) → join to gold mention ids
    keyed = clusters.select(
        F.col("document_id"), F.col("start_index"), F.col("end_index"), F.col("cluster_id")
    )
    gold_keyed = gold_mentions.select(
        "mention_id", "document_id", "start_index", "end_index"
    )
    remapped = gold_keyed.join(
        keyed, ["document_id", "start_index", "end_index"], "left"
    ).select("mention_id", F.coalesce("cluster_id", F.concat(F.lit("miss:"), "mention_id")).alias("cluster_id"))
    return pairwise_f1(labeled, remapped)
