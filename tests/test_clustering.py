"""large-star/small-star connected components (SURVEY.md §2.12)."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from e2e_el_spark.operators.clustering import cluster_nodes, connected_components


def _reference_cc(edges):
    """Driver-side union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        if a != b:  # engine drops self-loops (no cluster information)
            union(a, b)
    return {x: find(x) for x in parent}


def test_cc_basic(spark):
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (10, 11), (7, 7)], "src long, dst long"
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_chain_and_star(spark):
    # pathological chain: worst case for naive propagation; large/small-star
    # must converge in O(log n) driver iterations
    chain = [(i, i + 1) for i in range(50)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 51


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=60
    )
)
def test_cc_matches_union_find(spark, edge_list):
    oracle = _reference_cc(edge_list)
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.component for r in connected_components(edges).collect()}
    # both label by component-minimum node id, so exact equality is expected
    assert got == oracle


def test_cluster_nodes_isolated_singletons(spark):
    edges = spark.createDataFrame([("m1", "ENT:e1"), ("m2", "ENT:e1")], "src_key string, dst_key string")
    nodes = spark.createDataFrame([("m1",), ("m2",), ("m3",)], "node_key string")
    got = {r.node_key: r.cluster_id for r in cluster_nodes(edges, all_nodes=nodes).collect()}
    assert got["m1"] == got["m2"]
    assert got["m3"] != got["m1"]
    assert set(got) == {"m1", "m2", "m3", "ENT:e1"}
