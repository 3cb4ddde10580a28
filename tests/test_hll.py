"""Pins for the engine-portable HLL (aggregates.hll_*): estimate
accuracy at realistic cardinalities, the max-merge (rollup) property,
and bounded register state."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg


def _df(spark, values, group="g"):
    return spark.createDataFrame([(group, v) for v in values], "g string, v bigint")


def test_estimate_within_hll_error(spark):
    # alpha_64 standard error ~ 1.04/sqrt(64) = 13%; allow 2 sigma
    for true_n in (500, 2000):
        df = _df(spark, range(true_n))
        est = agg.hll_estimate(
            agg.hll_registers(df, ["g"], "v"), ["g"]
        ).collect()[0]
        assert abs(est.est_distinct - true_n) / true_n < 0.26, (
            true_n, est.est_distinct,
        )


def test_registers_bounded_and_duplicates_free(spark):
    # 10k values with heavy duplication -> still <= 64 register rows,
    # and duplicates cannot move the estimate (pure function of the
    # distinct value set)
    base = list(range(1000))
    reg_a = agg.hll_registers(_df(spark, base), ["g"], "v")
    reg_b = agg.hll_registers(_df(spark, base * 7), ["g"], "v")
    assert reg_a.count() <= 64
    a = sorted(map(tuple, reg_a.collect()))
    b = sorted(map(tuple, reg_b.collect()))
    assert a == b


def test_max_merge_equals_whole(spark):
    """The rollup property: registers of two halves, max-merged, give
    exactly the whole corpus's registers (hence the same estimate)."""
    whole = list(range(3000))
    left, right = whole[:1500], whole[1500:]
    reg_whole = agg.hll_registers(_df(spark, whole), ["g"], "v")
    merged = (
        agg.hll_registers(_df(spark, left), ["g"], "v")
        .unionByName(agg.hll_registers(_df(spark, right), ["g"], "v"))
        .groupBy("g", "bucket")
        .agg(F.max("rmax").alias("rmax"))
    )
    assert sorted(map(tuple, reg_whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    e1 = agg.hll_estimate(reg_whole, ["g"]).collect()[0].est_distinct
    e2 = agg.hll_estimate(merged, ["g"]).collect()[0].est_distinct
    assert e1 == e2
