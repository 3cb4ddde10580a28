"""Pins for relational.negative_sample: exclusion of seen pairs,
per-user cap, determinism, and the documented oversample shortfall."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import relational as rel


def _run(spark, pairs, n_items, k=3, oversample=2):
    inter = spark.createDataFrame(pairs, "user_id bigint, item_id bigint")
    n = spark.createDataFrame([(n_items,)], "n bigint")
    return rel.negative_sample(
        inter, "user_id", "item_id", n, k=k, oversample=oversample
    )


def test_negatives_exclude_seen_and_cap_per_user(spark):
    pairs = [(1, 1), (1, 2), (2, 5), (3, 9)]
    out = _run(spark, pairs, n_items=100, k=3).collect()
    seen = set(map(tuple, pairs))
    for r in out:
        assert (r.user_id, r.item_id) not in seen
        assert 1 <= r.item_id <= 100
    per_user = {}
    for r in out:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    assert set(per_user) == {1, 2, 3}
    assert all(c <= 3 for c in per_user.values())


def test_deterministic_across_calls(spark):
    pairs = [(7, 3), (8, 4), (9, 1)]
    a = sorted(map(tuple, _run(spark, pairs, 50).collect()))
    b = sorted(map(tuple, _run(spark, pairs, 50).collect()))
    assert a == b and a


def test_oversample_shortfall_documented(spark):
    # a user who has seen EVERY item can get zero negatives — the
    # operator must come up short rather than emit a false negative
    pairs = [(1, i) for i in range(1, 4)]
    out = _run(spark, pairs, n_items=3, k=2).collect()
    assert out == []


def test_dedup_keeps_earliest_draw(spark):
    # with a tiny item domain, different draws collide on the same
    # item; each (user, item) must appear at most once
    out = _run(spark, [(5, 999)], n_items=2, k=4, oversample=3).collect()
    items = [(r.user_id, r.item_id) for r in out]
    assert len(items) == len(set(items))


def test_group_sample_topk_fixed_size_and_deterministic(spark):
    from spark_cassandra_collabfiltering_spark.operators import relational as rel2

    rows = [(g, i) for g in ("a", "b") for i in range(g == "a" and 20 or 3)]
    df = spark.createDataFrame(rows, "src string, doc_id bigint")
    out = rel2.group_sample_topk(df, "src", "doc_id", k=5)
    got = sorted((r.src, r.doc_id) for r in out.collect())
    # exactly k for big groups, whole group when smaller than k
    assert sum(1 for s, _ in got if s == "a") == 5
    assert sum(1 for s, _ in got if s == "b") == 3
    again = sorted((r.src, r.doc_id)
                   for r in rel2.group_sample_topk(df, "src", "doc_id", k=5).collect())
    assert got == again
