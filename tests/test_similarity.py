"""Similarity search: brute-force top-k vs numpy oracle; LSH recall."""

import numpy as np
import pytest

from e2e_el_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    m = rng.randn(200, 16).astype(np.float32)
    rows = [(i, [float(x) for x in m[i]]) for i in range(200)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        m,
    )


def test_brute_force_matches_numpy(spark, vecs):
    df, m = vecs
    queries = df.filter("vec_id < 5")
    corpus = df.filter("vec_id >= 5")
    got = brute_force_topk(corpus, queries, k=10)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.score))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn[:5] @ mn[5:].T
    for q in range(5):
        order = np.argsort(-sims[q], kind="stable")[:10] + 5
        want = list(order)
        have = [v for _, v, _ in sorted(got_map[q])]
        assert have == want, (q, have, want)
        for rank, vid, score in got_map[q]:
            assert score == pytest.approx(float(sims[q, vid - 5]), abs=1e-5)


def test_lsh_topk_recall(spark, vecs):
    df, _ = vecs
    queries = df.filter("vec_id < 5")
    corpus = df.filter("vec_id >= 5")
    exact = brute_force_topk(corpus, queries, k=5)
    approx = lsh_topk(corpus, queries, k=5, n_planes=4, n_tables=8)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # multi-table LSH on random gaussians


def test_lsh_deterministic(spark, vecs):
    df, _ = vecs
    q = df.filter("vec_id < 3")
    c = df.filter("vec_id >= 3")
    r1 = sorted(map(tuple, lsh_topk(c, q, k=3).collect()))
    r2 = sorted(map(tuple, lsh_topk(c, q, k=3).collect()))
    assert r1 == r2


def test_ivf_topk_exact_when_probing_all_lists(spark):
    """n_probe = n_centroids ⇒ every list probed ⇒ results == brute force."""
    import random

    from e2e_el_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 5")
    c = df.filter("vec_id >= 5")
    exact = {(r.query_id, r.rank): r.vec_id for r in brute_force_topk(c, q, k=5).collect()}
    ivf = {(r.query_id, r.rank): r.vec_id for r in ivf_topk(
        c, q, k=5, n_centroids=4, n_probe=4, kmeans_iters=1
    ).collect()}
    assert ivf == exact


def test_ivf_topk_recall_on_clustered_data(spark):
    """Clustered corpus: each query's true nearest neighbors live in its own
    cluster, which maps to one inverted list — n_probe=2 of 8 lists must
    still find them (the IVF bet)."""
    import random

    from e2e_el_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = random.Random(4)
    centers = [[rng.choice([-1.0, 1.0]) for _ in range(8)] for _ in range(5)]
    rows = []
    for i in range(200):
        ctr = centers[i % 5]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in ctr]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 5")
    c = df.filter("vec_id >= 5")
    exact = brute_force_topk(c, q, k=10)
    approx = ivf_topk(c, q, k=10, n_centroids=8, n_probe=2, kmeans_iters=2)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_ivf_topk_deterministic_across_partitioning(spark):
    import random

    from e2e_el_spark.operators.similarity import ivf_topk

    rng = random.Random(2)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4")
    c = df.filter("vec_id >= 4")
    a = sorted(map(tuple, ivf_topk(c.repartition(1), q, k=5, n_centroids=6, n_probe=3).collect()))
    b = sorted(map(tuple, ivf_topk(c.repartition(7), q, k=5, n_centroids=6, n_probe=3).collect()))
    assert a == b


def test_ivf_assignment_is_zero_shuffle_and_matches_argmax(spark):
    """The coarse quantizer must be one narrow projection over a broadcast
    centroid ARRAY: no hash-partitioned Exchange, no Window (the old
    crossJoin + row_number shape shuffled N×K rows per Lloyd round). And its
    assignments must equal the brute-force argmax with the same tie-break
    (max cosine, ties → smallest centroid_id)."""
    import numpy as np

    from e2e_el_spark.operators.similarity import _assign_to_centroids

    rng = np.random.RandomState(7)
    vecs_np = rng.randn(40, 8).astype("float32")
    cents_np = rng.randn(5, 8).astype("float32")
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs_np)],
        "vec_id long, _v array<float>",
    )
    cents = spark.createDataFrame(
        [(i + 1, [float(x) for x in c]) for i, c in enumerate(cents_np)],
        "centroid_id int, _cent array<float>",
    )
    out = _assign_to_centroids(vecs, cents, "vec_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    got = {r.vec_id: r.centroid_id for r in out.collect()}
    vn = vecs_np / np.linalg.norm(vecs_np, axis=1, keepdims=True)
    cn = cents_np / np.linalg.norm(cents_np, axis=1, keepdims=True)
    sims = vn @ cn.T
    # numpy argmax returns the FIRST max index == smallest centroid_id tie-break
    want = {i: int(np.argmax(sims[i])) + 1 for i in range(len(vecs_np))}
    assert got == want


def test_lsh_topk_with_dim_is_fully_lazy(spark):
    """With dim passed, building the lsh_topk plan must fire ZERO Spark jobs
    (the dim-inference first() was a plan-time driver job)."""
    sc = spark.sparkContext
    e = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5) + 1.0 for d in range(8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = e.limit(3)
    sc.setJobGroup("lazy_lsh", "laziness probe")
    try:
        df = None
        from e2e_el_spark.operators.similarity import lsh_topk

        df = lsh_topk(e, q, k=2, n_planes=3, n_tables=2, dim=8)
        assert list(sc.statusTracker().getJobIdsForGroup("lazy_lsh")) == []
        df.count()
        assert list(sc.statusTracker().getJobIdsForGroup("lazy_lsh")) != []
    finally:
        sc.setJobGroup(None, None)


def test_embedding_near_duplicates_with_dim_is_fully_lazy(spark):
    from e2e_el_spark.operators.dedup import embedding_near_duplicates

    sc = spark.sparkContext
    e = spark.createDataFrame(
        [(i, [float((i * 3 + d) % 7) + 1.0 for d in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    sc.setJobGroup("lazy_emb", "laziness probe")
    try:
        df = embedding_near_duplicates(e, "vec_id", "embedding", dim=8)
        assert list(sc.statusTracker().getJobIdsForGroup("lazy_emb")) == []
        df.count()
    finally:
        sc.setJobGroup(None, None)


def _inlined_bucket_expr_r3(vec_col, n_planes, seed, dim):
    """The round-3 O(dim × n_planes)-term inlined form, kept here as the
    equivalence oracle for the dim-independent rewrite."""
    from pyspark.sql import functions as F

    bits = []
    for p in range(n_planes):
        terms = "+".join(
            f"(CAST(element_at({vec_col}, {d + 1}) AS DOUBLE) * "
            f"((pmod(xxhash64({seed}, {p}, {d}), 2000001) - 1000000) / 1000000.0))"
            for d in range(dim)
        )
        bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def test_hyperplane_bucket_matches_r3_inlined_form(spark, vecs):
    """The transform/zip_with/aggregate bucket must be bit-identical to the
    inlined per-term chain (same hash constants, same fold order)."""
    from e2e_el_spark.functions import hyperplane_bucket_expr

    df, _ = vecs
    new = hyperplane_bucket_expr("embedding", 6, seed=11, dim=16)
    old = _inlined_bucket_expr_r3("embedding", 6, seed=11, dim=16)
    n_diff = df.select(new.alias("a"), old.alias("b")).filter("a != b").count()
    assert n_diff == 0


def test_hyperplane_bucket_dim_independent_plan(spark):
    """At realistic embedding dims (1024) the bucket expression must stay
    O(n_planes) in size and analyze + execute without codegen blowup — the
    round-3 inlined form generated 6k-33k terms per bit there (Janino 64 KB
    method-limit fallback)."""
    import numpy as np

    from e2e_el_spark.functions import hyperplane_bucket_expr

    dim, n_planes = 1024, 16
    col = hyperplane_bucket_expr("embedding", n_planes, seed=3, dim=dim)
    # expression SIZE check: the generated SQL string is dim-independent
    # (the r3 form grew ~60 chars per (dim × plane) term)
    small = len(str(hyperplane_bucket_expr("embedding", n_planes, seed=3, dim=64)._jc))
    huge = len(str(hyperplane_bucket_expr("embedding", n_planes, seed=3, dim=4096)._jc))
    assert huge - small < 4 * n_planes  # only the dim literal's digits differ
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = df.select(col.alias("bucket")).collect()
    assert all(len(r.bucket) == n_planes and set(r.bucket) <= {"0", "1"} for r in got)
