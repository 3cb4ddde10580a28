"""SCD2 incremental-apply invariants: interval chaining, single current
version per key, and correct point-in-time lookups after a merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators.relational import scd2_apply


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_scd2_apply_merges_changes(spark):
    history = _mk(
        spark,
        [
            (1, "a", 0, 5),     # closed version
            (1, "b", 5, None),  # current
            (2, "x", 0, None),  # current, no changes incoming
        ],
        "k int, attr string, valid_from int, valid_to int",
    )
    changes = _mk(
        spark,
        [(1, "c", 10), (1, "d", 20), (3, "new", 7)],
        "k int, attr string, ts int",
    )
    out = scd2_apply(history, changes, ["k"], "ts")
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows == {
        (1, "a"): (0, 5),
        (1, "b"): (5, 10),    # current closed at first change
        (1, "c"): (10, 20),   # chained within the batch
        (1, "d"): (20, None), # new current
        (2, "x"): (0, None),  # untouched current
        (3, "new"): (7, None),  # brand-new key
    }
    # exactly one current version per key
    cur = out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_point_in_time_lookup(spark):
    history = _mk(spark, [(1, "a", 0, None)], "k int, attr string, valid_from int, valid_to int")
    changes = _mk(spark, [(1, "b", 10)], "k int, attr string, ts int")
    out = scd2_apply(history, changes, ["k"], "ts")
    at = lambda ts: {
        r["attr"]
        for r in out.filter(
            (F.col("valid_from") <= ts)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
        ).collect()
    }
    assert at(5) == {"a"}
    assert at(10) == {"b"}
    assert at(99) == {"b"}
