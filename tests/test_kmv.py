"""Pins for the KMV distinct sketch (operators/aggregates.py
kmv_state / kmv_distinct / kmv_overlap_pairs): exact-below-k regime,
mergeability, estimate accuracy at k=128, disjoint-pair coverage, and
the exact-overlap regime where union fits under k."""

import pyspark.sql.functions as F
import pytest

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg
from spark_cassandra_collabfiltering_spark.plans.queries import t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return t(spark, SF, "events").select("event_type", "user_id")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_below_k(spark, events):
    """k above every group's true distinct count => estimates EXACT."""
    st = agg.kmv_state(events, ["event_type"], "user_id", k=100000)
    got = {
        r.event_type: r.est_distinct
        for r in agg.kmv_distinct(st, ["event_type"], k=100000).collect()
    }
    want = {
        r.event_type: r.nd
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert got == want


def test_estimate_within_bound(spark, events):
    """k=128 relative error should sit well inside ~4/sqrt(k) (~35%);
    deterministic md5 draw => a stable regression pin."""
    k = 128
    st = agg.kmv_state(events, ["event_type"], "user_id", k=k)
    got = {
        r.event_type: r.est_distinct
        for r in agg.kmv_distinct(st, ["event_type"], k=k).collect()
    }
    want = {
        r.event_type: r.nd
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    for g, est in got.items():
        assert abs(est - want[g]) / want[g] <= 4 / (k ** 0.5), (g, est, want[g])


def test_state_merge_equals_batch(spark, events):
    """kmv_state of a union == k smallest distinct of the merged
    states — the mergeable-summaries contract (re-cap with
    kmv_state on the state itself, h as the value... the draw of a
    draw differs, so re-cap manually via bottomk_merge semantics)."""
    from pyspark.sql import Window

    k = 64
    a = events.filter(F.col("user_id") % 2 == 0)
    b = events.filter(F.col("user_id") % 2 == 1)
    direct = agg.kmv_state(events, ["event_type"], "user_id", k=k)
    both = agg.kmv_state(a, ["event_type"], "user_id", k=k).unionByName(
        agg.kmv_state(b, ["event_type"], "user_id", k=k)
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    merged = (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("event_type", "h")
    )
    assert _rows(direct) == _rows(merged)


def test_overlap_exact_when_union_under_k(spark):
    """Planted sets with known overlap, k large enough to hold the
    union: jaccard and intersection come out EXACT."""
    rows = [("A", i) for i in range(30)] + [("B", i) for i in range(20, 60)]
    df = spark.createDataFrame(rows, "g string, v long")
    st = agg.kmv_state(df, ["g"], "v", k=128)
    out = agg.kmv_overlap_pairs(st, "g", k=128).collect()
    assert len(out) == 1
    r = out[0]
    # |A|=30, |B|=40, common=10, union=60
    assert (r.group_a, r.group_b) == ("A", "B")
    assert r.k_u == 60 and r.n_common == 10
    assert r.union_est == 60 and r.inter_est == 10
    assert r.jaccard_e6 == 10 * 1000000 // 60


def test_disjoint_pair_gets_zero_row(spark):
    rows = [("A", i) for i in range(10)] + [("B", i + 1000) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    st = agg.kmv_state(df, ["g"], "v", k=64)
    out = agg.kmv_overlap_pairs(st, "g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_common == 0 and r.jaccard_e6 == 0 and r.inter_est == 0
    assert r.union_est == 20
