"""Heavy-hitter family: the exact top-terms query is oracle-checked
(text_topterms); these pin the count-min sketch estimator against that
exact truth — the CMS contract is estimate >= true count, overshooting
by at most eps*N w.p. confidence.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg  # noqa: E402
from spark_cassandra_collabfiltering_spark.plans.queries import t  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


def _terms(spark):
    return (
        t(spark, SF_SMOKE, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), 0
                )
            ).alias("term")
        )
    )


def test_count_min_bounds_vs_exact(spark):
    words = _terms(spark)
    exact = {
        r["term"]: r["n_occurrences"]
        for r in agg.top_frequent(words, "term", n=10).collect()
    }
    total = words.count()
    eps = 0.001
    est = dict(
        agg.count_min_estimates(
            words, "term", list(exact), eps=eps, confidence=0.99, seed=42
        )
    )
    assert set(est) == set(exact)
    for term, true_n in exact.items():
        assert est[term] >= true_n, (term, est[term], true_n)
        assert est[term] <= true_n + eps * total * 10, (term, est[term], true_n)


def test_count_min_deterministic_under_seed(spark):
    words = _terms(spark)
    top = [r["term"] for r in agg.top_frequent(words, "term", n=5).collect()]
    a = agg.count_min_estimates(words, "term", top, seed=7)
    b = agg.count_min_estimates(words, "term", top, seed=7)
    assert a == b


def test_space_saving_exact_when_capacity_covers_distinct(spark):
    """capacity >= distinct values: no prune ever fires, so the merged
    summaries ARE the exact counts and the error bound is zero."""
    words = _terms(spark)
    exact = {
        r["term"]: r["n_occurrences"]
        for r in agg.top_frequent(words, "term", n=10).collect()
    }
    got = agg.space_saving_topk(words, "term", k=10, capacity=10_000).collect()
    assert {r["value"]: r["est"] for r in got} == exact
    assert all(r["max_err"] == 0 for r in got)


def test_space_saving_bounds_under_pruning(spark):
    """capacity << distinct: for every emitted value the true count is
    in [est, est + max_err], and every value with true count > max_err
    is guaranteed emitted (mergeable Misra-Gries bound)."""
    words = _terms(spark)
    truth = {
        r["term"]: r["n"]
        for r in words.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    rows = agg.space_saving_topk(words, "term", k=50, capacity=16).collect()
    assert rows, "sketch returned nothing"
    max_err = rows[0]["max_err"]
    assert max_err > 0  # pruning actually fired at this capacity
    emitted = {r["value"] for r in rows}
    for r in rows:
        assert r["est"] <= truth[r["value"]] <= r["est"] + max_err, r
    # every guaranteed-heavy value must be present (top-50 >> survivors)
    for term, n in truth.items():
        if n > max_err:
            assert term in emitted, (term, n, max_err)
