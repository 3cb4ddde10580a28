#!/usr/bin/env python
"""Measured runtime bloom-filter join proof (r7) — the third member of
the engine's "Catalyst scale features, proven not narrated" set,
beside the AQE skew proof (scripts/skew_proof.py) and the DPP plan
contract (tests/test_lake.py).

The shape: a fact⋈dim SMJ where the dim carries a selective filter on
a NON-join column (attr = 7 keeps 1% of keys). Without help, every
fact row crosses the shuffle and dies in the join; with
InjectRuntimeFilter, Catalyst builds a bloom filter over the filtered
dim's join keys (the bloom_filter_agg subquery) and applies
might_contain() to the fact side BEFORE its exchange — ~99% of fact
rows (each dragging a 128 B payload) never shuffle.

Measured on local[32], 20M fact rows x 128 B payload, 1M-key dim,
1% selectivity, min-of-5 interleaved passes after warm-up:
bloom on 1.34 s vs off 4.08 s = **3.05x**, with might_contain +
bloom_filter_agg in the armed plan. Recorded in SCALING.md.

Arming facts worth knowing at production scale (all defaults in
Spark 4.1):

- spark.sql.optimizer.runtime.bloomFilter.enabled = true by DEFAULT —
  but applicationSideScanSizeThreshold = 10 GB means it never arms on
  CI-scale inputs. This script lowers that one threshold to 1 MB; at
  100 TB the fact side passes the default and the filter arms with no
  tuning. The creation side must stay under
  creationSideThreshold (10 MB) — a filtered dim, exactly the
  broadcast-join sweet spot the engine's stats_broadcast_advice
  pre-flights.
- The rewrite only fires for shuffle joins: with the dim under the
  broadcast threshold Spark picks BHJ and there is no fact shuffle to
  save (this script disables auto-broadcast to force the SMJ the
  production fact⋈fact case hits).
- The filter is applied pre-shuffle on the SCAN side, so the saving
  scales with fact row WIDTH — keys alone benefit little; real rows
  with payloads benefit most (same byte-vs-row lesson as the AQE
  skew-detection trap).

Deterministic plan assertions live in tests/test_bloom_runtime.py.
"""

from __future__ import annotations

import io
import os
import shutil
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_FACT = 20_000_000
N_KEYS = 1_000_000
BASE = "/tmp/spark_cassandra_collabfiltering_bloom_proof"


def gen(spark) -> None:
    fact = spark.range(N_FACT).select(
        (F.col("id") % N_KEYS).alias("k"),
        # 128 B payload: the bytes the bloom filter keeps off the wire
        F.concat(
            *[F.md5((F.col("id") + i).cast("string")) for i in range(4)]
        ).alias("payload"),
    )
    fact.write.mode("overwrite").parquet(BASE + "/fact")
    spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("attr")
    ).write.mode("overwrite").parquet(BASE + "/dim")


def query(spark):
    f = spark.read.parquet(BASE + "/fact")
    d = spark.read.parquet(BASE + "/dim").filter(F.col("attr") == 7)
    return f.join(d, "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("payload").alias("np"),
    )


def run(spark, enabled: bool) -> tuple[float, str]:
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        str(enabled).lower(),
    )
    j = query(spark)
    t0 = time.time()
    j.collect()
    dt = time.time() - t0
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    return dt, buf.getvalue()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bloom-join-proof")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        # force the SMJ the production fact-scale case hits
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the ONE threshold CI scale needs lowered; 100 TB passes the
        # 10 GB default on its own
        .config(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1MB",
        )
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    shutil.rmtree(BASE, ignore_errors=True)
    gen(spark)
    run(spark, True)
    run(spark, False)  # warm both paths
    best = {True: float("inf"), False: float("inf")}
    plans = {}
    for _ in range(5):
        for en in (True, False):
            dt, plan = run(spark, en)
            best[en] = min(best[en], dt)
            plans[en] = plan
    armed = "might_contain" in plans[True] and "bloom_filter_agg" in plans[True]
    clean = "might_contain" not in plans[False]
    print(
        f"bloom=on  {best[True]:6.2f} s   (plan armed: {armed})\n"
        f"bloom=off {best[False]:6.2f} s   (plan clean: {clean})\n"
        f"speedup   {best[False] / best[True]:6.2f}x"
    )
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
