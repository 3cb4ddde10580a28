"""Mergeable fixed-width-histogram quantiles (operators/aggregates.py).

Pins the three properties that make this the scale-path quantile:

1. MERGEABILITY: histograms built per time-slice and merged by summing
   counts give bit-identical quantiles to one direct build — the
   continuous-aggregate contract (same as ev_rollup_merge).
2. ERROR BOUND: the estimate is within one bin width of the exact
   percentile.
3. determinism + bin-edge clamping contracts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg  # noqa: E402

LO, HI, BINS = 0.0, 50.0, 25
WIDTH = (HI - LO) / BINS


def _li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_shipdate"
    )


def test_merged_slices_equal_direct(spark):
    li = _li(spark)
    direct = agg.fixed_width_histogram(li, "l_quantity", ["l_returnflag"], LO, HI, BINS)
    # slice by ship month, histogram each slice, merge by summing counts
    sliced = agg.fixed_width_histogram(
        li.withColumn("m", F.month("l_shipdate")),
        "l_quantity", ["l_returnflag", "m"], LO, HI, BINS,
    )
    merged = sliced.groupBy("l_returnflag", "bin").agg(F.sum("cnt").alias("cnt"))
    qd = sorted(
        map(tuple, agg.histogram_quantiles(
            direct, ["l_returnflag"], [0.5, 0.9, 0.95], LO, HI, BINS
        ).collect())
    )
    qm = sorted(
        map(tuple, agg.histogram_quantiles(
            merged, ["l_returnflag"], [0.5, 0.9, 0.95], LO, HI, BINS
        ).collect())
    )
    assert qd == qm and len(qd) > 0


def test_estimate_within_one_bin_of_exact(spark):
    li = _li(spark)
    h = agg.fixed_width_histogram(li, "l_quantity", ["l_returnflag"], LO, HI, BINS)
    est = {
        (r["l_returnflag"], r["q"]): r["est"]
        for r in agg.histogram_quantiles(
            h, ["l_returnflag"], [0.5, 0.95], LO, HI, BINS
        ).collect()
    }
    exact = {
        (r["l_returnflag"], q): r[f"p{int(q*100)}"]
        for r in li.groupBy("l_returnflag").agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        ).collect()
        for q in (0.5, 0.95)
    }
    assert set(est) == set(exact)
    for key, e in est.items():
        assert abs(e - exact[key]) <= WIDTH, (key, e, exact[key])


def test_clamping_and_validation(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 49.99), ("a", 50.0), ("a", 99.0)],
        "g string, x double",
    )
    h = {
        r["bin"]: r["cnt"]
        for r in agg.fixed_width_histogram(df, "x", ["g"], LO, HI, BINS).collect()
    }
    # below-range clamps to bin 0, at/above hi clamps to the last bin
    assert h[0] == 2 and h[BINS - 1] == 3
    with pytest.raises(ValueError, match="bins"):
        agg.fixed_width_histogram(df, "x", ["g"], LO, HI, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        agg.fixed_width_histogram(df, "x", ["g"], 10.0, 10.0, 4)


# --- robust_outliers (exact median/MAD companion) --------------------------


def test_mad_outliers_flags_planted_extremes(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    # group a: tight cluster around 100 plus two wild values
    vals = [("a", v) for v in [98, 99, 100, 100, 101, 102, 5000, -4000]]
    # group b: all identical -> MAD 0, nothing beats 0 spread except
    # any deviation at all
    vals += [("b", 7)] * 5
    df = spark.createDataFrame(vals, "grp string, x bigint")
    got = {r.grp: r for r in agg.robust_outliers(df, "grp", "x").collect()}
    a = got["a"]
    # n=8 -> med2 = x_(4)+x_(5) = 100+100 = 200; d = |2x-200|:
    # [4,2,0,0,2,4,9800,8200] -> sorted [0,0,2,2,4,4,8200,9800],
    # mad4 = ranks 4+5 = 2+4 = 6 (MAD 1.5); 2d > 18 flags exactly
    # the two planted extremes
    assert (a.n, a.med2, a.mad4, a.n_outliers) == (8, 200, 6, 2)
    b = got["b"]
    assert (b.n, b.med2, b.mad4, b.n_outliers) == (5, 14, 0, 0)


def test_mad_outliers_even_group_median_interpolates(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 3), ("g", 10)], "grp string, x bigint"
    )
    got = agg.robust_outliers(df, "grp", "x").collect()[0]
    # med2 = 2+3 = 5 (median 2.5); d = |2x-5| = [3,1,1,15];
    # mad4 = 1+3 = 4 (MAD 1); outlier iff 2d > 12 -> only x=10
    assert (got.n, got.med2, got.mad4, got.n_outliers) == (4, 5, 4, 1)


# --- ks_statistic ----------------------------------------------------------


def test_ks_identical_distributions_is_zero(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5] * 4], "v bigint")
    got = agg.ks_statistic(a, a, "v").collect()[0]
    assert (got.n_a, got.n_b, got.d_e6) == (20, 20, 0)


def test_ks_disjoint_supports_is_one(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    a = spark.createDataFrame([(v,) for v in [1, 2, 3]], "v bigint")
    b = spark.createDataFrame([(v,) for v in [10, 11]], "v bigint")
    got = agg.ks_statistic(a, b, "v").collect()[0]
    assert got.d_e6 == 1_000_000
    assert got.at_value == 3  # smallest value attaining the sup


def test_ks_hand_computed_value(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    # A = {1,2,3,4}, B = {3,4,5,6}: D = 1/2 attained first at v=2
    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "v bigint")
    b = spark.createDataFrame([(v,) for v in [3, 4, 5, 6]], "v bigint")
    got = agg.ks_statistic(a, b, "v").collect()[0]
    assert (got.d_e6, got.at_value) == (500_000, 2)


def test_ks_shape_change_detected_despite_equal_medians(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    # same median (0), very different spread — KS sees it
    a = spark.createDataFrame([(v,) for v in [-1, 0, 0, 0, 1]], "v bigint")
    b = spark.createDataFrame([(v,) for v in [-100, -50, 0, 50, 100]], "v bigint")
    got = agg.ks_statistic(a, b, "v").collect()[0]
    assert got.d_e6 >= 350_000


# --- gini_concentration ----------------------------------------------------


def test_gini_even_distribution_is_zero(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    df = spark.createDataFrame([("g", 5)] * 8, "grp string, x bigint")
    got = agg.gini_concentration(df, "grp", "x").collect()[0]
    assert (got.n, got.total, got.gini_e6) == (8, 40, 0)


def test_gini_single_owner_approaches_one(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [("g", 0)] * 9 + [("g", 100)], "grp string, x bigint"
    )
    got = agg.gini_concentration(df, "grp", "x").collect()[0]
    # G = (n-1)/n = 0.9 when one of n rows owns everything
    assert got.gini_e6 == 900_000


def test_gini_hand_computed_and_zero_total(spark):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("z", 0), ("z", 0)],
        "grp string, x bigint",
    )
    got = {r.grp: r for r in agg.gini_concentration(df, "grp", "x").collect()}
    # a: (2*(1+4+9) - 4*6)/(3*6) = 4/18 -> 222222
    assert got["a"].gini_e6 == 222_222
    assert got["z"].gini_e6 == 0  # zero-total convention
