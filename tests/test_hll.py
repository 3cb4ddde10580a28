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


def test_chi2_contingency_known_values(spark):
    """2x2 table with known chi-square: obs [[10,20],[20,10]] ->
    expected all 15, chi2 = 4*(25/15) = 6.666668 (6-decimal rounded
    contributions), dof = 1. Independence case -> chi2 exactly 0."""
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = agg.chi2_contingency(df, "r", "c").collect()
    assert len(out) == 4
    assert all(r.dof == 1 for r in out)
    assert all(r.expected_r6 == 15.0 for r in out)
    assert all(abs(r.contrib_r6 - 25 / 15) < 1e-5 for r in out)
    assert abs(out[0].chi2_total - 4 * round(25 / 15, 6)) < 1e-9

    indep = spark.createDataFrame(
        [("a", "x")] * 6 + [("a", "y")] * 6 + [("b", "x")] * 3 + [("b", "y")] * 3,
        "r string, c string",
    )
    out2 = agg.chi2_contingency(indep, "r", "c").collect()
    assert all(r.contrib_r6 == 0.0 and r.chi2_total == 0.0 for r in out2)


def test_quality_percentile_transform_monotone(spark):
    """Percentile normalization: within a source, pct_e6 is monotone
    in the score, spans [0, 1e6), and two sources with disjoint score
    ranges still both cover the low percentiles (rank is per-source)."""
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    out = QUERIES["curation_quality_percentile"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    by_source = {}
    for r in out:
        assert 0 <= r.pct_e6 < 1_000_000
        by_source.setdefault(r.source, []).append((r.quality_e6, r.pct_e6))
    for src, pairs in by_source.items():
        pairs.sort()
        pcts = [p for _, p in pairs]
        assert pcts == sorted(pcts), src  # monotone in score
        assert pcts[0] == 0, src          # lowest bin -> percentile 0


def test_hll_rolling_estimate_merges_windows(spark):
    """A user active on days 1 AND 5 counts once in any window holding
    both days (register max-merge), and the rolling estimate for a
    day equals the plain estimate over the union of its window's
    users — merge == recompute, the mergeability contract."""
    from pyspark.sql import functions as F

    rows = []
    # day 0: users 0..19; day 4: users 10..29 (overlap 10..19)
    for u in range(20):
        rows.append((0, u))
    for u in range(10, 30):
        rows.append((4, u))
    df = spark.createDataFrame(rows, "dnum bigint, user_id bigint")
    reg = agg.hll_registers(df, ["dnum"], "user_id")
    rolled = {
        r.dnum: (r.n_buckets, r.harmonic_scaled, r.est_distinct)
        for r in agg.hll_rolling_estimate(reg, "dnum", window=7).collect()
    }
    # day-4 window covers both days -> same state as estimating the
    # union directly
    union = df.select(F.col("user_id")).withColumn("g", F.lit(1))
    direct = agg.hll_estimate(
        agg.hll_registers(union, ["g"], "user_id"), ["g"]
    ).collect()[0]
    assert rolled[4] == (
        direct.n_buckets, direct.harmonic_scaled, direct.est_distinct
    )
    # day-0 window is day 0 alone
    solo = agg.hll_estimate(
        agg.hll_registers(
            df.filter(F.col("dnum") == 0), ["dnum"], "user_id"
        ),
        ["dnum"],
    ).collect()[0]
    assert rolled[0] == (
        solo.n_buckets, solo.harmonic_scaled, solo.est_distinct
    )
