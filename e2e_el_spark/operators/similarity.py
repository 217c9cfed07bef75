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

from e2e_el_spark.functions import cosine_expr, dot_expr, hyperplane_bucket_expr

# L2 norm of an array column — the per-side half of a cosine; hoisted out of
# pair loops so it is evaluated once per vector, not once per pair
_NORM_EXPR = "sqrt(aggregate({v}, 0D, (s, v) -> s + CAST(v AS DOUBLE) * v))"


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
    if metric == "cosine":
        # hoist the L2 norms OUT of the pair loop: each side's norm is
        # computed once per row instead of once per (query × corpus) pair —
        # the interpreted aggregate() fold is the expensive part of the
        # score, and 2 of its 3 evaluations per pair were redundant.
        # dot/(norm_q · norm_c) is the exact expression cosine_expr builds,
        # on the same double values, so scores are bit-identical.
        q = q.withColumn("_qn", F.expr(_NORM_EXPR.format(v="_qv")))
        c = c.withColumn("_cn", F.expr(_NORM_EXPR.format(v="_cv")))
    scored = c.crossJoin(F.broadcast(q))
    if metric == "cosine":
        scored = scored.withColumn(
            "score", dot_expr("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))
        )
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
    """Random-hyperplane sign bucket, deterministic from (seed, plane, dim);
    expression size O(n_planes), independent of dim (see
    ``functions.hyperplane_bucket_expr`` — bit-identical to the round-3
    inlined form, without its O(dim × n_planes) analysis/codegen blowup)."""
    return hyperplane_bucket_expr(vec_col, n_planes, seed, dim)


def _assign_to_centroids(
    vecs: DataFrame, cents: DataFrame, id_name: str
) -> DataFrame:
    """Nearest centroid per vector — ONE narrow projection, zero shuffle of
    the corpus (the IVF coarse quantizer).

    The K-row centroid table collapses to a single broadcast row holding
    ARRAY<STRUCT(centroid_id, _cent, _cn)>; each corpus vector computes all K
    cosines inside one ``transform`` lambda and takes ``array_max`` over
    (score, -centroid_id) structs — max score, ties to the smallest id. The
    previous shape (crossJoin + row_number window partitioned by vec_id)
    shuffled N×K rows per Lloyd round and per list build: at 10⁹ vectors ×
    K=4096 that shuffle IS the job. The cosine operand order replicates
    ``functions.cosine_expr`` exactly (dot / (norm_v * norm_cent)), so
    assignments are bit-identical to the window form."""
    cent_arr = (
        cents.select(
            "centroid_id", "_cent",
            F.expr("sqrt(aggregate(_cent, 0D, (s, v) -> s + CAST(v AS DOUBLE) * v))").alias("_cn"),
        )
        .agg(F.array_sort(F.collect_list(F.struct("centroid_id", "_cent", "_cn"))).alias("_cents"))
    )
    best = (
        "array_max(transform(_cents, c -> struct("
        "aggregate(zip_with(_v, c._cent, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (s, v) -> s + v)"
        " / (_vn * c._cn) AS s, -c.centroid_id AS ncid)))"
    )
    return (
        vecs.withColumn(
            "_vn", F.expr("sqrt(aggregate(_v, 0D, (s, v) -> s + CAST(v AS DOUBLE) * v))")
        )
        .crossJoin(F.broadcast(cent_arr))
        .withColumn("_best", F.expr(best))
        .select(id_name, "_v", F.expr("CAST(-_best.ncid AS INT)").alias("centroid_id"))
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 16, n_probe: int = 4, kmeans_iters: int = 1,
    seed: int = 17,
) -> DataFrame:
    """IVF ANN: coarse quantizer (K centroids) → inverted lists → probe the
    ``n_probe`` nearest lists per query → exact cosine within probed lists.

    The distributed form of FAISS IVF (the reference's index is IndexFlat,
    `/root/reference/utils_FullTransformer.py:252-312`; IVF is its scale
    path). Everything is DataFrame algebra:

    - centroid INIT: K corpus vectors picked by deterministic hash order
      (seeded — same centroids at any parallelism);
    - ``kmeans_iters`` Lloyd refinements: element-wise mean per list via
      posexplode + groupBy(centroid, pos) — K×dim rows, tiny;
    - assignment + probing: crossJoin(broadcast(K centroids)) + argmax /
      top-n_probe — the K-row table broadcasts everywhere;
    - search: probe pairs ⋈ inverted lists on centroid_id, exact cosine,
      window top-k. Each query touches ~n_probe/K of the corpus instead of
      all of it; recall grows with n_probe (exact when n_probe = K).

    Returns (query_id, vec_id, score, rank).
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    # deterministic sampled centroids; the K-row window is bounded by K
    cw = Window.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)))
    cents = (
        c.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)))
        .limit(n_centroids)
        .withColumn("centroid_id", F.row_number().over(cw))
        .select("centroid_id", F.col("_v").alias("_cent"))
    )
    for _ in range(max(kmeans_iters, 0)):
        assigned = _assign_to_centroids(c, cents, "vec_id")
        cents = (
            assigned.select("centroid_id", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("centroid_id", "_p")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("_p", "_m"))).alias("_s"))
            .select(
                "centroid_id",
                F.expr("transform(_s, x -> CAST(x._m AS float))").alias("_cent"),
            )
        )
    # per-vector norms hoisted out of the probe-pair scoring (bit-identical
    # to cosine_expr — see brute_force_topk)
    lists = _assign_to_centroids(c, cents, "vec_id").select(
        "centroid_id", "vec_id", F.col("_v").alias("_cv"),
        F.expr(_NORM_EXPR.format(v="_v")).alias("_cn"),
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_v"))
    qs = q.crossJoin(F.broadcast(cents)).withColumn("_cs", cosine_expr("_v", "_cent"))
    pw = Window.partitionBy("query_id").orderBy(F.desc("_cs"), F.asc("centroid_id"))
    probes = (
        qs.withColumn("_r", F.row_number().over(pw))
        .filter(F.col("_r") <= n_probe)
        .select(
            "query_id", F.col("_v").alias("_qv"), "centroid_id",
            F.expr(_NORM_EXPR.format(v="_v")).alias("_qn"),
        )
    )
    pairs = probes.join(lists, "centroid_id").select(
        "query_id", "vec_id", "_qv", "_cv", "_qn", "_cn"
    )
    scored = pairs.withColumn(
        "score", dot_expr("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 6, n_tables: int = 4, seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Each table hashes vectors to a 2^n_planes sign bucket; a query probes
    only its own bucket per table (union over tables for recall), then exact
    cosine + window top-k within the probed set. At 100 TB the probed set is
    ~n_tables/2^n_planes of the corpus per query instead of all of it.

    Pass ``dim`` (the embedding dimensionality — callers know it) to keep
    plan construction fully lazy; None falls back to a driver-side
    ``first()`` probe, which fires a Spark job at PLAN-BUILD time.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    probed = None
    for t in range(n_tables):
        bexpr = _bucket_expr(vec_col, n_planes, seed + t, dim)
        cb = corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"), bexpr.alias("bucket"),
            F.expr(_NORM_EXPR.format(v=vec_col)).alias("_cn"),
        )
        qb = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), bexpr.alias("bucket"),
            F.expr(_NORM_EXPR.format(v=vec_col)).alias("_qn"),
        )
        pairs = cb.join(F.broadcast(qb), "bucket").select(
            "query_id", "vec_id", "_qv", "_cv", "_qn", "_cn"
        )
        probed = pairs if probed is None else probed.unionByName(pairs)
    probed = probed.dropDuplicates(["query_id", "vec_id"])
    # norms hoisted per side (bit-identical to cosine_expr — see brute_force_topk)
    scored = probed.withColumn(
        "score", dot_expr("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
