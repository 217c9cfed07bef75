"""Transitive closure over the match graph (SURVEY.md §2.12).

The reference links each mention independently to its argmax entity
(`/root/reference/run_E2E_exhaustive.py:570-575`); a "cluster" is the set of
mentions sharing a predicted entity id (:584-611). This engine generalizes
that to **connected components over the match graph** via the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — a driver loop of pure DataFrame steps,
converging in O(log n) rounds, with per-iteration ``localCheckpoint`` to
truncate lineage (no Catalyst rule covers fixpoints; SURVEY.md §4 custom
work #2).

Node ids are 64-bit content hashes (xxhash64 of the string node key) so
cluster assignment is deterministic across reruns and parallelism levels —
never ``monotonically_increasing_id`` (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set, canonical (small, large), self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star(u): connect every strictly-larger neighbor of u to
    min(Γ(u) ∪ {u}). Emits (v, m) for v ∈ Γ(u), v > u."""
    bidir = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        bidir.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least(F.col("_mn"), F.col("src")).alias("m"))
    )  # m = min(Γ(u) ∪ {u})
    out = (
        bidir.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    return _canonical(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star(u): over neighbors v ≤ u, connect all of them (and u) to
    the minimum. Operates on edges directed large→small."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = directed.groupBy("src").agg(F.min("dst").alias("m"))
    neighbors = directed.join(m, "src").select(
        F.col("dst").alias("v"), F.col("m").alias("dst2"), F.col("src").alias("u")
    )
    re_u = directed.join(m, "src").select(
        F.col("src").alias("v"), F.col("m").alias("dst2"), F.col("src").alias("u")
    )
    out = (
        neighbors.unionAll(re_u)
        .filter(F.col("v") != F.col("dst2"))
        .select(F.col("v").alias("src"), F.col("dst2").alias("dst"))
    )
    return _canonical(out)


def connected_components(
    edges: DataFrame, max_iterations: int = 25, checkpoint: bool = True
) -> DataFrame:
    """edges(src BIGINT, dst BIGINT) → assignments(node BIGINT, component BIGINT).

    component = the minimum node id reachable from ``node``. Deterministic:
    pure function of the edge set.
    """
    from pyspark.sql import Observation

    sig_metrics = lambda: (  # noqa: E731 — tiny metric-column factory
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    )
    cur = _canonical(edges)
    if checkpoint:
        cur = cur.localCheckpoint(eager=True)
    prev_sig = None
    for i in range(max_iterations):
        cur = _small_star(_large_star(cur))
        if checkpoint:
            # fold the convergence signature into the checkpoint
            # materialization via an observed metric: ONE Spark job per
            # fixpoint round instead of two (the separate agg/collect probe
            # was half the driver round-trips of the whole CC stage)
            obs = Observation(f"cc_sig_{i}")
            cur = cur.observe(obs, *sig_metrics()).localCheckpoint(eager=True)
            row = obs.get
            sig = (row["n"], row["h"])
        else:
            sig_row = cur.agg(*sig_metrics()).collect()[0]
            sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: canonical edges are (root, member) with root = src = the
    # component minimum; each member maps to it and the root to itself.
    members = cur.select(F.col("dst").alias("node"), F.col("src").alias("component"))
    roots = cur.select(F.col("src").alias("node"), F.col("src").alias("component"))
    return (
        members.unionAll(roots).groupBy("node").agg(F.min("component").alias("component"))
    )


def cluster_nodes(
    edges_str: DataFrame, all_nodes: DataFrame | None = None,
    src_col: str = "src_key", dst_col: str = "dst_key",
) -> DataFrame:
    """String-keyed wrapper: edges over string node keys → (node_key, cluster_id).

    cluster_id is the xxhash64 of the component's minimum node id rendered as
    a string — stable content-derived cluster labels. ``all_nodes`` (one
    column ``node_key``) adds isolated nodes as singleton clusters.
    """
    ids = edges_str.select(
        F.xxhash64(F.col(src_col)).alias("src"), F.xxhash64(F.col(dst_col)).alias("dst")
    )
    assign = connected_components(ids)
    mapping = (
        edges_str.select(F.col(src_col).alias("node_key"))
        .unionAll(edges_str.select(F.col(dst_col).alias("node_key")))
        .distinct()
        .withColumn("node", F.xxhash64("node_key"))
        .join(assign, "node", "left")
        .select(
            "node_key",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
    if all_nodes is not None:
        extra = (
            all_nodes.select("node_key")
            .join(mapping.select("node_key"), "node_key", "left_anti")
            .withColumn("component", F.xxhash64("node_key"))
        )
        mapping = mapping.unionByName(extra)
    return mapping.select(
        "node_key", F.concat(F.lit("c"), F.col("component").cast("string")).alias("cluster_id")
    )
