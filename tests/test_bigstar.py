"""Big-star/small-star connected components (Kiveris et al. 2014):
equality with min-label propagation on random dirty graphs, and the
long-path case that motivates the algorithm (label propagation pays
diameter rounds; star rewrites collapse it logarithmically)."""

from __future__ import annotations

import pytest

import random

from spark_cassandra_collabfiltering_spark.operators import dedup as dd


def _cc_ref(edges):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    label = {}
    for s in sorted(adj):
        if s in label:
            continue
        comp, stack, seen = [], [s], {s}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    return label


@pytest.mark.slow
def test_bigstar_equals_label_propagation_on_random_graphs(spark):
    rnd = random.Random(3)
    for _ in range(3):
        edges = [(rnd.randint(0, 50), rnd.randint(0, 50)) for _ in range(40)]
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        a = {
            r.node: r.cluster_id
            for r in dd.connected_components_bigstar(df).collect()
        }
        b = {
            r.node: r.cluster_id
            for r in dd.connected_components(df).collect()
        }
        assert a == b == _cc_ref(edges)


def test_bigstar_collapses_long_path(spark):
    # a 60-node path: diameter 60, but star rewrites converge in
    # O(log^2 n) rounds — max_iter=30 would be FAR too small for
    # label propagation on this graph, and is plenty here.
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r.node: r.cluster_id
        for r in dd.connected_components_bigstar(df, max_iter=30).collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_bigstar_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r.node: r.cluster_id
        for r in dd.connected_components_bigstar(df).collect()
    }
    # pure self-loop node 1 has no non-self edge -> not a cluster member
    assert got == {2: 2, 3: 2}


def test_incremental_cc_equals_full_recompute(spark):
    """Star(old labels) ∪ new pairs reconverges to exactly the CC of
    the union pair graph — including a new bridge edge MERGING two old
    clusters, and a batch-only cluster appearing fresh."""
    old_pairs = [(1, 2), (2, 3), (10, 11)]
    new_pairs = [(3, 10), (20, 21)]  # bridge 1-cluster with 10-cluster
    labels = dd.connected_components(
        spark.createDataFrame(old_pairs, "id_a bigint, id_b bigint")
    )
    got = {
        r.node: r.cluster_id
        for r in dd.connected_components_incremental(
            labels,
            spark.createDataFrame(new_pairs, "id_a bigint, id_b bigint"),
        ).collect()
    }
    full = {
        r.node: r.cluster_id
        for r in dd.connected_components(
            spark.createDataFrame(
                old_pairs + new_pairs, "id_a bigint, id_b bigint"
            )
        ).collect()
    }
    assert got == full
    assert got[11] == 1  # merged across the bridge
    assert got[21] == 20  # fresh batch-only cluster
