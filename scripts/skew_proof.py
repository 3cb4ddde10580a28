#!/usr/bin/env python
"""Measured AQE skew-join proof for the Q13 slot (VERDICT r5 #3).

Generates a Zipf-skewed orders corpus at sf1-equivalent volume (15M
order rows; the hottest custkey owns 30% of ALL rows — far past the
>=1% skew bar), runs the Q13-grade customer⋈orders join with AQE's
skew-join rewrite OFF vs ON, and prints both wall times plus the
skew-split evidence from the final adaptive plan.

Measured on local[32] (best-of-3 interleaved): skewJoin=off 3.01 s,
skewJoin=on 1.63 s (1.85x), SortMergeJoin(skew=true) + "AQEShuffleRead
coalesced and skewed" in the final plan. Recorded in SCALING.md.

Two detection traps found the hard way, both documented inline because
they WILL recur in production tuning:

- AQE measures skew in post-compression BYTES, not rows: a hot key's
  constant join column lz4-compresses to ~0.3 B/row, so a 15x row
  skew can read as 1.3x in bytes and never arm the rewrite. Rows need
  real payload width crossing the shuffle (they have it in any real
  orders table; the synthetic corpus must not let column pruning strip
  it).
- Catalyst column-prunes an aggregate no downstream consumer reads, so
  the payload must survive to the OUTPUT for the byte skew to exist.

Two honest facts this script demonstrates, matching how the engine
actually mitigates Q13-class skew:

1. The JOIN-side mitigation is AQE's OptimizeSkewedJoin: with the
   rewrite enabled the hot shuffle partition is split into N subtasks
   (``skew=true`` on the SortMergeJoin, "skewed splits" in the
   AQEShuffleRead), and the straggler task disappears from the wall
   time. Thresholds are lowered to CI-scale bytes — the REWRITE is
   what's being proven; production defaults (256 MB) only change when
   it arms, not what it does. NOTE: the rewrite applies to the INNER
   join here — for Q13's LEFT OUTER shape Spark cannot split the
   orders (right) side without breaking no-match detection, which is
   exactly why q_g14_custdist leans on mitigation #2.
2. The AGG-side mitigation in g14_custdist itself is partial
   aggregation: count per c_custkey collapses the hot key map-side,
   so the exchange carries one row per (task, custkey). That property
   is plan-asserted in tests/test_skew_aqe.py.

Results land in SCALING.md ("AQE skew-join proof" section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_ORDERS = 15_000_000  # sf1 orders volume (straggler must dominate)
N_CUST = 15_000
HOT_SHARE = 4_500_000  # hot custkey owns 30% of all order rows


def skewed_orders(spark):
    """Zipf-flavored: custkey 0 owns HOT_SHARE rows; the rest rank-
    decay over the key space (id % k with k rising) — deterministic,
    no RNG."""
    return spark.range(N_ORDERS).select(
        F.when(F.col("id") < HOT_SHARE, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_CUST)))
        .alias("o_custkey"),
        F.col("id").alias("o_orderkey"),
        # incompressible payload: real order rows are wide — without
        # it, column pruning ships ONE constant long for the hot key
        # and lz4 erases the byte skew the detector looks at
        F.xxhash64("id").cast("double").alias("o_total"),
    )


def customers(spark):
    return spark.range(N_CUST).select(
        F.col("id").alias("c_custkey"),
        (F.col("id") % 25).alias("c_nationkey"),
    )


def q13_grade_join(spark):
    c, o = customers(spark), skewed_orders(spark)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])  # inner: splittable
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("c_count"),
            F.max("o_total").alias("max_total"),
        )
        .groupBy("c_count")
        # the payload must reach the OUTPUT: an aggregate nothing
        # consumes is column-pruned out of the shuffle, the constant
        # hot custkey then lz4-compresses to ~0.3 B/row, and the BYTE
        # skew the detector measures evaporates (found the hard way —
        # a 15x row skew read as 1.3x in bytes)
        .agg(
            F.count(F.lit(1)).alias("custdist"),
            F.sum("max_total").alias("chk"),
        )
    )


def run(spark, skew_enabled: bool) -> tuple[float, str]:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
    t0 = time.perf_counter()
    df = q13_grade_join(spark)
    # execute through the df's OWN QueryExecution (collect, not a
    # noop write — a write builds a separate QE and the df's adaptive
    # plan would never finalize); the count-of-counts result is tiny
    df.collect()
    dt = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    return dt, plan


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew-proof")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        # arm the rewrite at CI bytes: hot partition is tens of MB vs a
        # sub-MB median; factor 2 + 256k threshold arm it the way 5x +
        # 256 MB would at cluster scale
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        # Q13 pipelines the join into the per-custkey agg, so splitting
        # the hot partition costs an extra exchange before the agg —
        # Spark vetoes that by default; force it (the straggler costs
        # more than the exchange at skew this hot)
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # force the shuffled join path — a broadcast would hide the
        # skew entirely (and at 100 TB the orders side is never small)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (codegen/JIT) then interleaved best-of-3 per mode
    for mode in (False, True):
        run(spark, mode)
    best = {False: float("inf"), True: float("inf")}
    plans = {}
    for _ in range(3):
        for mode in (False, True):
            dt, plan = run(spark, mode)
            best[mode] = min(best[mode], dt)
            plans[mode] = plan
    off, on = best[False], best[True]
    has_split = "skew=true" in plans[True]
    print(f"rows={N_ORDERS} hot_share={HOT_SHARE} ({100*HOT_SHARE/N_ORDERS:.0f}%)")
    print(f"skewJoin=off: {off:.2f}s")
    print(f"skewJoin=on : {on:.2f}s  ({off/on:.2f}x)")
    print(f"skew=true in adaptive plan: {has_split}")
    if not has_split:
        sys.exit("EXPECTED the skew-join rewrite to arm — it did not")


if __name__ == "__main__":
    main()
