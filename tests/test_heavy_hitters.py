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
