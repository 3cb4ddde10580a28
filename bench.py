#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution per query: build the DataFrame plan, then drain it through the
noop sink (`format("noop")`) — full distributed execution of every
operator with no driver-side collect bottleneck, which is what a cluster
run would measure. One warm-up query amortizes the JVM/codegen start so
numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: the reference's core pipeline (RMSE analog + ALS) plus
# one representative per operator family (scan+agg, star join, window,
# dedup/LSH, ANN, text, event sessionization). r4 adds the two
# mandated-extension paths that previously had no tracked perf series:
# approximate ANN (sign-LSH bucketed top-k) and curation
# (contamination check via broadcast n-gram join). Totals therefore
# jump vs r1-r3 BY CONSTRUCTION; BASELINE.md carries the r4 comparable
# per-query series and the widened band. r5 adds two more tracked
# series the same way (totals widen BY CONSTRUCTION again; the
# legacy-11/13 subtotals stay the round-over-round comparables):
# URL canonicalization (scan-local web dedup) and degree-oriented
# triangle counting (graph clustering structure). r5-cont3 adds BM25
# (the lexical-retrieval arm's posting-list join — the hybrid-search
# workhorse) the same way. r5-cont4 adds the two in-engine TRAINED
# model paths: the Naive Bayes classifier gate (train + score both in
# the measured plan) and the bigram-LM perplexity filter — the
# legacy-11/13/16 subtotals stay the round-over-round comparables.
# r5-cont5 adds trigram-index substring search (candidate-intersection
# + verify vs the raw LIKE scan it replaces) and multi-touch
# attribution (the bucketized windowed join + exact cent shares).
HEADLINE = [
    "g1_pricing_summary",
    "j6_multiway_revenue",
    "j8_asof_click_attribution",
    "a3_rmse_item_mean",
    "w1_topk_per_user",
    "dedup_minhash_lsh",
    "text_winnowing",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality",
    "curation_contamination",
    "ev_sessionize",
    "cf_als_pipeline",
    "curation_url_canonical",
    "graph_triangles",
    "lex_bm25_topk",
    "ml_nb_confusion",
    "text_lm_perplexity",
    "lex_trigram_search",
    "j10_multitouch_attribution",
    # r5-cont6 adds the Q13 outer-join count-distribution (the classic
    # skew-benchmark agg) and the bottom-k rank-quantile sketch (the
    # deterministic KLL slot) as tracked series — totals widen BY
    # CONSTRUCTION; the legacy-11/13/16/18/20 subtotals stay the
    # round-over-round comparables.
    "g14_custdist",
    "sketch_bottomk_quantiles",
    # r6 adds the EXACT-similarity join arm (VERDICT r5 #5): PPJoin
    # was the most expensive registered query with no tracked series —
    # the prefix-filter calibration now gets a perf line beside
    # dedup_minhash_lsh's lossy arm. Totals widen BY CONSTRUCTION
    # (this is the suite's priciest member); the legacy subtotals stay
    # the comparables.
    "dedup_ppjoin",
    # r7 adds the itemknn recommender's bounded-subset twin (VERDICT
    # r6 #4: the full cf_ndcg_itemknn was the heaviest registered
    # query with no tracked series — 23-39 s at sf0.1). The _sub
    # series runs the IDENTICAL wedge-join pipeline on a
    # deterministic 25% user draw, exact-oracled. Totals widen BY
    # CONSTRUCTION; the legacy subtotals stay the comparables.
    "cf_ndcg_itemknn_sub",
]


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark_cassandra_collabfiltering-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .config("spark.executor.extraJavaOptions", "-Xss16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_one(spark, builder, sf_dir: str) -> float:
    spark.catalog.clearCache()
    # Force a JVM GC so the ContextCleaner reclaims dead broadcasts /
    # shuffle state from prior queries — accumulated debris otherwise
    # bleeds multi-second GC pauses into later queries' timings.
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # Pass 0 (untimed): one full-suite warm-up pass. Absorbs JVM start,
    # parquet footers, and per-query codegen/JIT compilation (measured
    # 5-6x on expression-heavy plans; amortizes to nothing over
    # cluster-scale data).
    for name in HEADLINE:
        run_one(spark, QUERIES[name].builder, SF_DIR)

    sf = None
    tail = os.path.basename(SF_DIR.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    # Passes 1-3 (timed): full-suite passes, per-query min across
    # passes. INTERLEAVED on purpose: this host shows multi-second CPU-
    # steal bursts, and back-to-back best-of-3 on one query lets a
    # single burst poison all of that query's repeats (r1: the same
    # queries measured 0.6 s and 3.5 s in different fresh runs).
    # Spreading repeats across suite passes puts a burst on different
    # queries each pass, so the min recovers the plan cost. Same total
    # work as per-query best-of-3.
    timings: dict[str, float] = {name: float("inf") for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            timings[name] = min(
                timings[name], run_one(spark, QUERIES[name].builder, SF_DIR)
            )
    timings = {name: round(v, 3) for name, v in timings.items()}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
