"""AQE skew-join evidence for the Q13 slot (VERDICT r5 #3) — the
deterministic plan half of scripts/skew_proof.py (which carries the
measured wall-time half: 3.01 s -> 1.63 s, 1.85x, on the 15M-row/30%
-hot corpus).

Pins two properties:

1. The OptimizeSkewedJoin rewrite ARMS on a Zipf-skewed shuffled join
   when thresholds are at CI bytes: SortMergeJoin(skew=true) in the
   final adaptive plan. forceOptimizeSkewedJoin=true is required
   because Q13 pipelines the join into a per-custkey aggregate that
   reuses the join partitioning — splitting the hot partition adds an
   exchange, which Spark vetoes by default (worth it at real skew).
2. g14_custdist's own skew armor is PARTIAL AGGREGATION: the per-
   custkey count collapses the hot key map-side (partial_count before
   the exchange), so the Q13 LEFT OUTER shape — whose orders side AQE
   cannot split without breaking no-match detection — never funnels
   raw hot-key rows through one reducer.

Byte-skew trap (documented in skew_proof.py): AQE detects skew in
post-compression bytes; the skewed side must carry payload that
survives column pruning, or a constant hot key compresses the skew
away.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ORDERS = 1_500_000
N_CUST = 15_000
HOT_SHARE = 450_000  # 30% of all rows on one custkey

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # CI-scale arming: production defaults (256 MB / 5x) only change
    # WHEN the rewrite arms, not what it does
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _skewed_orders(spark):
    return spark.range(N_ORDERS).select(
        F.when(F.col("id") < HOT_SHARE, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_CUST)))
        .alias("o_custkey"),
        F.col("id").alias("o_orderkey"),
        F.xxhash64("id").cast("double").alias("o_total"),
    )


def _customers(spark):
    return spark.range(N_CUST).select(F.col("id").alias("c_custkey"))


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skewed_join_rewrite_arms(spark):
    old = _with_confs(spark, _SKEW_CONFS)
    try:
        c, o = _customers(spark), _skewed_orders(spark)
        df = (
            c.join(o, c["c_custkey"] == o["o_custkey"])
            .groupBy("c_custkey")
            .agg(
                F.count("o_orderkey").alias("c_count"),
                F.max("o_total").alias("max_total"),
            )
            .groupBy("c_count")
            .agg(
                F.count(F.lit(1)).alias("custdist"),
                F.sum("max_total").alias("chk"),  # payload must reach output
            )
        )
        df.collect()  # the df's OWN QE must finalize the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
        assert "skewed" in plan, plan[:3000]  # AQEShuffleRead ... skewed
    finally:
        _restore(spark, old)


def test_skew_split_preserves_results(spark):
    """The rewrite must not change answers: custdist with the skew
    split ON equals the plain-shuffle result."""

    def build():
        c, o = _customers(spark), _skewed_orders(spark)
        return (
            c.join(o, c["c_custkey"] == o["o_custkey"])
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
        )

    old = _with_confs(spark, _SKEW_CONFS)
    try:
        with_split = {r["c_count"]: r["custdist"] for r in build().collect()}
    finally:
        _restore(spark, old)
    old = _with_confs(spark, {"spark.sql.adaptive.skewJoin.enabled": "false"})
    try:
        plain = {r["c_count"]: r["custdist"] for r in build().collect()}
    finally:
        _restore(spark, old)
    assert with_split == plain
    # the hot customer's count survives (HOT_SHARE planted rows plus
    # the uniform branch's incidental hits on key 0)
    assert max(with_split) >= HOT_SHARE
    assert with_split[max(with_split)] == 1


def test_g14_partial_agg_absorbs_hot_custkey(spark):
    """The Q13 LEFT OUTER shape's agg-side armor: partial_count on
    c_custkey must sit BELOW the exchange, so the hot key collapses
    map-side to one row per task."""
    import re

    import spark_cassandra_collabfiltering_spark.plans.queries as Q

    df = Q.QUERIES["g14_custdist"].builder(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().toString()
    m = re.search(
        r"partial_count.*?\n(?:.*\n)*?.*Exchange hashpartitioning\(c_custkey",
        plan,
    )
    # formatted-plan order: the partial agg must appear ABOVE (i.e.
    # execute below) the custkey exchange — the map-side collapse that
    # absorbs the hot key before any shuffle
    assert m, plan[:3000]
    assert "LeftOuter" in plan or "left_outer" in plan, plan[:3000]
