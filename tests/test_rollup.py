"""Rollup merge-correctness properties (the oracle query
ev_rollup_merge checks the daily end-state; these pin the algebra):

- merging hourly partials to days == aggregating raw events to days;
- incremental refresh: partials built from disjoint slices of the
  stream, unioned and merged, == partials built in one shot.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import rollup as ru  # noqa: E402
from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


def _rows(df):
    return sorted(
        (r["bucket"], r["event_type"], r["n_events"], r["sum_value"],
         r["min_value"], r["max_value"], r["avg_value"])
        for r in df.collect()
    )


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")


def test_merged_partials_equal_direct_daily_agg(spark):
    ev = _events(spark)
    via_partials = ru.finalize(
        ru.merge_rollup(ru.rollup_partials(ev, bucket_seconds=3600), factor=24)
    )
    direct = ru.finalize(ru.rollup_partials(ev, bucket_seconds=86400))
    got, want = _rows(via_partials), _rows(direct)
    assert got == want and len(got) > 0


def test_incremental_union_refresh_equals_one_shot(spark):
    ev = _events(spark)
    # two refresh runs over disjoint slices of the stream (split by a
    # row-hash — slices share time buckets, the harder merge case)
    a = ev.filter(F.crc32(F.col("value").cast("string")) % 2 == 0)
    b = ev.filter(F.crc32(F.col("value").cast("string")) % 2 == 1)
    incremental = ru.merge_rollup(
        ru.rollup_partials(a, 3600).unionByName(ru.rollup_partials(b, 3600)),
        factor=1,
    )
    one_shot = ru.rollup_partials(ev, 3600)
    assert _rows(ru.finalize(incremental)) == _rows(ru.finalize(one_shot))


def test_coarse_query_reads_only_partials(spark):
    """Plan shape: the daily query over the persisted partial table
    must scan the partial parquet, not raw events."""
    import io

    ev = _events(spark)
    path = "/tmp/rollup_partials_test"
    ru.rollup_partials(ev, 3600).write.mode("overwrite").parquet(path)
    daily = ru.finalize(ru.merge_rollup(spark.read.parquet(path), factor=24))
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        daily.explain("formatted")
    finally:
        sys.stdout = stdout
    plan = buf.getvalue()
    assert "rollup_partials_test" in plan and "events.parquet" not in plan
    # and the answer still matches the direct daily aggregation
    direct = ru.finalize(ru.rollup_partials(ev, 86400))
    assert _rows(daily) == _rows(direct)


def test_streaming_refresh_equals_batch_rollup(spark, tmp_path):
    """Drain the event stream through the foreachBatch rollup refresher
    (multiple micro-batches) — the persisted partial table must equal a
    one-shot batch rollup of the same events, and the daily merge on
    top must equal the direct daily aggregation."""
    from spark_cassandra_collabfiltering_spark.streaming import events as evs

    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")

    stream = evs.read_event_stream(spark, src, max_files_per_trigger=1)
    evs.run_foreach_batch_rollup(
        stream.select("ts", "event_type", "value"), target, bucket_seconds=3600
    )

    streamed = spark.read.parquet(target)
    one_shot = ru.rollup_partials(ev, 3600)
    assert _rows(ru.finalize(streamed)) == _rows(ru.finalize(one_shot))
    daily = ru.finalize(ru.merge_rollup(streamed, factor=24))
    direct = ru.finalize(ru.rollup_partials(ev, 86400))
    assert _rows(daily) == _rows(direct)
