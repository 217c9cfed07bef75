"""Similarity search over embedding columns (SURVEY.md §2.5 T2/T3).

The reference's dense retrieval is FAISS IndexFlatL2 over an in-memory
candidate matrix (`/root/reference/utils_FullTransformer.py:252-312`) and
torch.topk hard-negative mining (`/root/reference/utils_E2E_exhaustive.py:409-423`).
Distributed re-expression:

* brute-force cosine top-k — broadcast the (small) query side, score with a
  JVM-side zip_with/aggregate dot product, window top-k. Exact; the baseline.
* IVF-style bucketed ANN — assign every vector to its nearest of K
  deterministic centroid hashes (coarse quantizer), probe only matching
  buckets. The scale path: each query touches 1/K of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from e2e_el_spark.functions import cosine_expr, dot_expr


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query: crossJoin(broadcast(queries)).

    The corpus stays partitioned; only queries replicate (the reference's
    'embed the KB once' hoist inverted — here queries are the small side).
    Returns (query_id, vec_id, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q))
    if metric == "cosine":
        scored = scored.withColumn("score", cosine_expr("_qv", "_cv"))
    elif metric == "dot":
        scored = scored.withColumn("score", dot_expr("_qv", "_cv"))
    else:  # negative L2 so that larger = closer, like the others
        scored = scored.withColumn(
            "score",
            -F.sqrt(
                F.expr(
                    "aggregate(zip_with(_qv, _cv, (x, y) -> CAST(x - y AS DOUBLE) * (x - y)), 0D, (s, v) -> s + v)"
                )
            ),
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _bucket_expr(vec_col: str, n_planes: int, seed: int, dim: int) -> F.Column:
    """Random-hyperplane sign bucket, deterministic from (seed, plane, dim)."""
    bits = []
    for p in range(n_planes):
        terms = "+".join(
            f"(CAST(element_at({vec_col}, {d + 1}) AS DOUBLE) * "
            f"((pmod(xxhash64({seed}, {p}, {d}), 2000001) - 1000000) / 1000000.0))"
            for d in range(dim)
        )
        bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 6, n_tables: int = 4, seed: int = 11,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Each table hashes vectors to a 2^n_planes sign bucket; a query probes
    only its own bucket per table (union over tables for recall), then exact
    cosine + window top-k within the probed set. At 100 TB the probed set is
    ~n_tables/2^n_planes of the corpus per query instead of all of it.
    """
    dim = len(corpus.select(vec_col).first()[0])
    probed = None
    for t in range(n_tables):
        bexpr = _bucket_expr(vec_col, n_planes, seed + t, dim)
        cb = corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"), bexpr.alias("bucket")
        )
        qb = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), bexpr.alias("bucket")
        )
        pairs = cb.join(F.broadcast(qb), "bucket").select("query_id", "vec_id", "_qv", "_cv")
        probed = pairs if probed is None else probed.unionByName(pairs)
    probed = probed.dropDuplicates(["query_id", "vec_id"])
    scored = probed.withColumn("score", cosine_expr("_qv", "_cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
