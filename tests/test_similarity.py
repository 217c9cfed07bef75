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
