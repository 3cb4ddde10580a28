"""Pins for the bottom-k rank-quantile sketch (operators/aggregates.py
bottomk_sample / bottomk_merge / bottomk_quantiles): the mergeable-
summaries contract (merge == batch, exactly), order-independence, the
DKW sample-quantile error bound vs exact CDFs, and bounded state."""

import math

import pyspark.sql.functions as F
import pytest

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg
from spark_cassandra_collabfiltering_spark.plans.queries import t

SF = "/root/testdata/sf0.001"
K = 64
QS = (25, 50, 75, 90)


@pytest.fixture(scope="module")
def docs(spark):
    return t(spark, SF, "documents").select("doc_id", "source", "n_chars")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_batch(spark, docs):
    """Sketch(A ∪ B) == merge(sketch(A) ∪ sketch(B)) — bit-exact, the
    property that makes it a sketch and not just a sample."""
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    direct = agg.bottomk_sample(docs, ["source"], "n_chars", "doc_id", k=K)
    merged = agg.bottomk_merge(
        agg.bottomk_sample(a, ["source"], "n_chars", "doc_id", k=K).unionByName(
            agg.bottomk_sample(b, ["source"], "n_chars", "doc_id", k=K)
        ),
        ["source"],
        k=K,
    )
    assert _rows(direct) == _rows(merged)
    # and the quantile estimates off either state agree
    qd = agg.bottomk_quantiles(direct, ["source"], QS)
    qm = agg.bottomk_quantiles(merged, ["source"], QS)
    assert _rows(qd) == _rows(qm)


def test_order_and_partitioning_independence(spark, docs):
    base = agg.bottomk_sample(docs, ["source"], "n_chars", "doc_id", k=K)
    shuffled = agg.bottomk_sample(
        docs.repartition(13, "n_chars"), ["source"], "n_chars", "doc_id", k=K
    )
    assert _rows(base) == _rows(shuffled)


def test_bounded_state(spark, docs):
    smp = agg.bottomk_sample(docs, ["source"], "n_chars", "doc_id", k=K)
    over = smp.groupBy("source").count().filter(F.col("count") > K)
    assert over.count() == 0


def test_dkw_error_bound_vs_exact(spark, docs):
    """For every (source, q): the TRUE CDF at the estimate is within
    the DKW band sqrt(ln(2/δ)/2k) (δ=0.01 → ~0.19 at k=64; the md5
    draw is fixed, so this is a deterministic regression pin, padded
    to 0.25 for the right-step of the empirical CDF at small m)."""
    eps = math.sqrt(math.log(2 / 0.01) / (2 * K)) + 0.06
    smp = agg.bottomk_sample(docs, ["source"], "n_chars", "doc_id", k=K)
    est = agg.bottomk_quantiles(smp, ["source"], QS).collect()
    rows = docs.groupBy("source").agg(
        F.sort_array(F.collect_list("n_chars")).alias("vals")
    ).collect()
    vals = {r["source"]: r["vals"] for r in rows}
    for r in est:
        vs = vals[r["source"]]
        cdf = sum(1 for v in vs if v <= r["est"]) / len(vs)
        assert abs(cdf - r["q_pct"] / 100) <= eps, (r, cdf)
