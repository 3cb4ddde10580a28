"""Streaming tests: each streaming plan drained with availableNow must
equal its batch analog on the same events (stream/batch unification is
the point of Structured Streaming)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table
from spark_cassandra_collabfiltering_spark.streaming import events as ev

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """Re-shard the events table into a multi-file stream source dir
    (micro-batches pick up files incrementally)."""
    src = str(tmp_path_factory.mktemp("events_src"))
    batch = load_table(spark, SF_SMOKE, "events")
    batch.repartition(4).write.mode("overwrite").parquet(src)
    return src


@pytest.fixture(scope="module")
def batch_events(spark, event_source):
    return ev.EVENT_SCHEMA, spark.read.schema(ev.EVENT_SCHEMA).parquet(event_source)


def test_tumbling_counts_matches_batch(spark, event_source, batch_events):
    _, batch = batch_events
    stream = ev.read_event_stream(spark, event_source)
    ev.run_to_memory(ev.tumbling_counts(stream), "tumbling", output_mode="append")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    # Append mode only emits windows the final watermark has closed
    # (window_end <= max(ts) - 10min); the trailing open window stays
    # in state forever on a bounded source. Compare against the batch
    # result restricted to closed windows.
    import datetime as _dt

    max_ts = batch.agg(F.max("ts")).first()[0]
    final_wm = max_ts - _dt.timedelta(minutes=10)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            batch.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .collect()
        )
        if r["window_end"] <= final_wm
    }
    assert got == want and len(got) > 0


def test_session_counts_matches_batch(spark, event_source, batch_events):
    _, batch = batch_events
    stream = ev.read_event_stream(spark, event_source)
    ev.run_to_memory(ev.session_counts(stream), "sessions", output_mode="append")
    # Append mode emits only sessions closed by the final watermark
    # (session_end <= max(ts) - 60min); compare per-session on that set.
    import datetime as _dt

    max_ts = batch.agg(F.max("ts")).first()[0]
    final_wm = max_ts - _dt.timedelta(minutes=60)
    g = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    w = {
        (r["user_id"], r["s"]["start"]): r["n"]
        for r in (
            batch.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if r["s"]["end"] <= final_wm
    }
    assert g == w and len(g) > 0


def test_session_batch_analog_agrees_with_registry(spark, event_source, batch_events):
    """session_window sessions == the lag+cumsum sessionization the
    registry oracles (same 30-min gap semantics)."""
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    reg = QUERIES["ev_sessionize"].builder(spark, SF_SMOKE)
    _, batch = batch_events
    sw = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    r = {x["user_id"]: (x["n_sessions"], x["n_events"]) for x in reg.collect()}
    s = {x["user_id"]: (x["n_sessions"], x["n_events"]) for x in sw.collect()}
    assert r == s


def test_stateful_running_totals(spark, event_source, batch_events):
    _, batch = batch_events
    stream = ev.read_event_stream(spark, event_source)
    ev.run_to_memory(ev.running_user_totals(stream), "totals", output_mode="update")
    # update mode with availableNow: one final row per user (single batch)
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM totals GROUP BY user_id"
    ).collect()
    want = {r["user_id"]: r["n"] for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r["user_id"]: r["n"] for r in got} == want


def test_sliding_avg_runs(spark, event_source):
    stream = ev.read_event_stream(spark, event_source)
    ev.run_to_memory(ev.sliding_avg(stream), "sliding", output_mode="append")
    rows = spark.sql("SELECT count(*) AS n FROM sliding").first()
    assert rows["n"] > 0


@pytest.mark.slow
def test_stream_stream_join_matches_batch(spark, event_source, batch_events):
    _, batch = batch_events
    stream = ev.read_event_stream(spark, event_source)
    ev.run_to_memory(ev.purchase_click_join(stream), "attrib", output_mode="append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    clicks = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    purchases = batch.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            (F.col("u") == F.col("user_id"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == want and len(got) > 0


@pytest.fixture(scope="module")
def ordered_event_source(spark, batch_events, tmp_path_factory):
    """Time-ordered multi-file source: events split into 4 sequential
    time ranges, one file each, named so the file source picks them up
    in event-time order. An arrival order that tracks event time is
    what outer-join tests need — with random file order, rows behind
    the watermark are (correctly) dropped as late."""
    _, batch = batch_events
    src = str(tmp_path_factory.mktemp("events_ordered"))
    pdf = batch.orderBy("ts", "event_id").toPandas()
    quarter = (len(pdf) + 3) // 4
    import pyarrow as pa
    import pyarrow.parquet as pq

    chunk_max_ts = []
    for i in range(4):
        chunk = pdf.iloc[i * quarter : (i + 1) * quarter]
        chunk_max_ts.append(chunk["ts"].max().to_pydatetime())
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            os.path.join(src, f"chunk-{i:02d}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return src, chunk_max_ts


@pytest.mark.slow
def test_stream_stream_left_outer_join(spark, ordered_event_source, batch_events):
    """left_outer keeps purchases with no qualifying click, emitting
    them with null click columns once the watermark passes their
    eviction point. Drained file-by-file over a time-ordered source so
    the watermark advances across micro-batches (a single giant batch
    would read everything before the watermark ever moves)."""
    _, batch = batch_events
    src, chunk_max_ts = ordered_event_source
    stream = ev.read_event_stream(spark, src, max_files_per_trigger=1)
    ev.run_to_memory(
        ev.purchase_click_join(stream, how="left_outer"), "attrib_outer",
        output_mode="append",
    )
    rows = spark.sql("SELECT * FROM attrib_outer").collect()
    got_matched = {(r["purchase_id"], r["click_id"]) for r in rows if r["click_id"] is not None}
    got_nulls = {r["purchase_id"] for r in rows if r["click_id"] is None}

    clicks = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    purchases = batch.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    cond = (
        (F.col("u") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes"))
    )
    want_matched = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(clicks, cond).collect()
    }
    # Matched pairs: exactly the batch inner join (outer ⊇ inner).
    assert got_matched == want_matched
    # Null rows must be genuinely unmatched purchases — no false nulls,
    # and each emitted at most once.
    want_unmatched = {
        r["purchase_id"]
        for r in purchases.join(clicks, cond, "left_anti").collect()
    }
    assert got_nulls <= want_unmatched
    assert len(got_nulls) == len([r for r in rows if r["click_id"] is None])
    # Every unmatched purchase whose eviction point (purchase_ts +
    # watermark delay) the final batch's GOVERNING watermark has passed
    # must have been emitted. Watermarks take effect one batch late:
    # the watermark in force while batch k processes was computed from
    # batch k-1's max event time — so the last guaranteed-applied
    # watermark derives from the penultimate chunk.
    import datetime as _dt

    governing_wm = chunk_max_ts[-2] - _dt.timedelta(minutes=30)
    must_emit = {
        r["purchase_id"]
        for r in purchases.join(clicks, cond, "left_anti")
        .filter(
            F.col("pts") + F.expr("INTERVAL 30 minutes") < F.lit(governing_wm)
        )
        .collect()
    }
    assert must_emit <= got_nulls and len(got_nulls) > 0


def test_dedup_within_watermark(spark, event_source, batch_events, tmp_path):
    """Duplicate every event in the source; the deduped stream must
    equal the original distinct set."""
    _, batch = batch_events
    dup_src = str(tmp_path / "dup_events")
    batch.unionByName(batch).repartition(4).write.mode("overwrite").parquet(dup_src)
    stream = ev.read_event_stream(spark, dup_src)
    ev.run_to_memory(
        ev.dedup_within_watermark(stream, ["event_id"]), "deduped",
        output_mode="append",
    )
    n = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM deduped").first()
    assert n["n"] == n["d"] == batch.count()


def test_stream_static_enrich(spark, event_source, batch_events):
    _, batch = batch_events
    from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table

    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    stream = ev.read_event_stream(spark, event_source)
    ev.run_to_memory(
        ev.enrich_stream_static(stream, dim, ["user_id"]), "enriched",
        output_mode="append",
    )
    got = spark.sql(
        "SELECT count(*) AS n, count(c_name) AS matched FROM enriched"
    ).first()
    want = batch.join(dim, "user_id", "left")
    assert got["n"] == batch.count()
    assert got["matched"] == want.filter(F.col("c_name").isNotNull()).count()


def test_checkpoint_recovery_exactly_once(spark, batch_events, tmp_path):
    """Restarting a checkpointed query must process only NEW files and
    never duplicate rows in the file sink (exactly-once via the sink
    commit log), including a no-op restart with nothing new."""
    _, batch = batch_events
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    half1 = batch.filter(F.col("event_id") % 2 == 0)
    half2 = batch.filter(F.col("event_id") % 2 == 1)
    half1.repartition(2).write.mode("append").parquet(src)

    def run_once():
        q = (
            ev.read_event_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == half1.count()

    half2.repartition(2).write.mode("append").parquet(src)
    run_once()  # restart: picks up only the new files
    run_once()  # idempotent no-op restart
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_foreach_batch_upsert(spark, event_source, batch_events, tmp_path):
    _, batch = batch_events
    target = str(tmp_path / "user_totals")
    stream = ev.read_event_stream(spark, event_source)
    totals = ev.running_user_totals(stream)
    ev.run_foreach_batch_upsert(totals, target, ["user_id"])
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.read.parquet(target).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_kafka_value_decode_roundtrip(spark, batch_events):
    """parse_kafka_events must invert to_json over EVENT_SCHEMA — the
    broker-free check of the kafka path's only transformation (the
    source itself is option plumbing, pinned below)."""
    _, batch = batch_events
    payload = batch.select(
        F.to_json(
            F.struct(*batch.columns), {"timestampFormat": ev.KAFKA_TS_FORMAT}
        ).cast("binary").alias("value")
    )
    back = ev.parse_kafka_events(payload)
    assert back.schema == ev.EVENT_SCHEMA
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(back.collect(), key=key) == sorted(batch.collect(), key=key)


def test_kafka_reader_option_wiring():
    opts = ev.kafka_reader_options(
        "broker1:9092,broker2:9092", "events", "latest",
        max_offsets_per_trigger=10_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "10000",
    }
    # default: no backpressure cap entry at all (kafka treats the
    # option's mere presence as a cap)
    assert "maxOffsetsPerTrigger" not in ev.kafka_reader_options("b:9092", "t")


@pytest.mark.slow
def test_live_soak_kill_restore_exactly_once(spark, batch_events, tmp_path):
    """LIVE soak of the stateful upsert pipeline (round-5 stretch):
    a real continuous readStream (processingTime trigger, not
    availableNow) over a growing file source, foreachBatch-upserting
    running per-user totals into parquet, KILLED mid-run while more
    files land, then RESTORED from the same checkpoint. Exactly-once
    effect check: final per-user (n_events, total_value) equal the
    batch ground truth — a replayed epoch (possible across the kill)
    must converge via the idempotent merge, and restored state must
    continue from the checkpoint instead of recounting."""
    import time

    _, batch = batch_events
    src, target, ckpt = (str(tmp_path / d) for d in ("soaksrc", "tgt", "ck"))
    os.makedirs(src, exist_ok=True)

    # six deterministic slices land as separate files over the run
    slices = [batch.filter(F.col("event_id") % 6 == i) for i in range(6)]

    def land(i):
        slices[i].coalesce(1).write.mode("append").parquet(src)

    def target_users():
        try:
            return spark.read.parquet(target).count()
        except Exception:  # target mid-overwrite or not yet created
            return -1

    def wait_until(pred, timeout=90.0):
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if pred():
                return True
            time.sleep(0.5)
        return False

    def start():
        stream = ev.read_event_stream(spark, src, max_files_per_trigger=1)
        return ev.run_foreach_batch_upsert(
            ev.running_user_totals(stream), target, ["user_id"],
            checkpoint=ckpt, processing_time="500 milliseconds",
        )

    land(0)
    land(1)
    q = start()
    try:
        # live phase 1: two slices flowing, a third lands mid-flight
        land(2)
        n_first3 = (
            batch.filter(F.col("event_id") % 6 < 3)
            .select("user_id").distinct().count()
        )
        assert wait_until(lambda: target_users() >= n_first3), (
            "live query never caught up with the first three slices"
        )
    finally:
        q.stop()  # the KILL — possibly mid-epoch

    land(3)  # lands while the query is down
    q2 = start()  # RESTORE from the same checkpoint
    try:
        land(4)
        land(5)
        want_users = batch.select("user_id").distinct().count()
        assert wait_until(lambda: target_users() == want_users), (
            "restored query never caught up with all six slices"
        )

        def totals_match():
            try:
                got = {
                    r["user_id"]: (r["n_events"], round(r["total_value"], 6))
                    for r in spark.read.parquet(target).collect()
                }
            except Exception:
                return False
            want = {
                r["user_id"]: (r["n"], round(r["tv"], 6))
                for r in batch.groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("tv"),
                )
                .collect()
            }
            return got == want

        # exactly-once effect: totals converge to batch ground truth
        # (duplicated replay would inflate n_events; lost state would
        # undercount)
        assert wait_until(totals_match), "per-user totals never converged"
    finally:
        q2.stop()


def test_streaming_hll_register_merge_matches_batch(spark, event_source, batch_events, tmp_path):
    """The portable HLL's max-merge property, exercised through
    Structured Streaming: each micro-batch's register table max-merges
    into a parquet state via foreachBatch, and the final registers —
    and therefore the estimate — equal the single-pass batch sketch
    exactly (the mergeable-summaries contract, streamed)."""
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    _, batch = batch_events
    target = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "ckpt")
    stream = ev.read_event_stream(spark, event_source).select(
        "event_type", "user_id"
    )

    def merge(bdf, epoch_id):
        reg = agg.hll_registers(bdf, ["event_type"], "user_id")
        sess = bdf.sparkSession
        try:
            prev = sess.read.parquet(target)
            reg = prev.unionByName(reg)
        except Exception:
            pass
        merged = reg.groupBy("event_type", "bucket").agg(
            F.max("rmax").alias("rmax")
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(target)
    want = agg.hll_registers(batch, ["event_type"], "user_id")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, want.collect())
    )
    e_stream = {
        r.event_type: r.est_distinct
        for r in agg.hll_estimate(streamed, ["event_type"]).collect()
    }
    e_batch = {
        r.event_type: r.est_distinct
        for r in agg.hll_estimate(want, ["event_type"]).collect()
    }
    assert e_stream == e_batch


def test_streaming_ks_grid_merge_matches_batch(spark, event_source, batch_events, tmp_path):
    """The KS statistic's input — the per-side distinct-value count
    grid — is a trivially mergeable summary (counts add). Exercised
    through Structured Streaming: each micro-batch's (v, ca, cb) grid
    sum-merges into parquet state via foreachBatch; the KS computed
    from the final merged grid equals the single-pass batch statistic
    EXACTLY. Drift monitoring therefore streams with bounded state
    (one row per distinct value), no re-scan of history."""
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    _, batch = batch_events
    target = str(tmp_path / "ks_state")
    ckpt = str(tmp_path / "ks_ckpt")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    stream = ev.read_event_stream(spark, event_source).select(
        "event_type", cents.alias("v")
    )

    def merge(bdf, epoch_id):
        grid = bdf.groupBy("v").agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("cb"),
        )
        sess = bdf.sparkSession
        try:
            prev = sess.read.parquet(target)
            grid = prev.unionByName(grid)
        except Exception:
            pass
        merged = grid.groupBy("v").agg(
            F.sum("ca").alias("ca"), F.sum("cb").alias("cb")
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # KS from the streamed/merged grid: rebuild per-side value frames
    g = spark.read.parquet(target)
    a_rows = g.select("v", "ca").filter(F.col("ca") > 0)
    b_rows = g.select("v", "cb").filter(F.col("cb") > 0)
    a = a_rows.select(F.explode(F.array_repeat(F.col("v"), F.col("ca").cast("int"))).alias("v"))
    b = b_rows.select(F.explode(F.array_repeat(F.col("v"), F.col("cb").cast("int"))).alias("v"))
    got = agg.ks_statistic(a, b, "v").collect()[0]

    ba = batch.filter(F.col("event_type") == "click").select(cents.alias("v"))
    bb = batch.filter(F.col("event_type") == "view").select(cents.alias("v"))
    want = agg.ks_statistic(ba, bb, "v").collect()[0]
    assert (got.n_a, got.n_b, got.d_e6, got.at_value) == (
        want.n_a, want.n_b, want.d_e6, want.at_value,
    )


def test_streaming_space_saving_merge_bounds_and_exactness(
    spark, event_source, batch_events, tmp_path
):
    """The Misra-Gries summary's merge (space_saving_merge) streamed
    through foreachBatch: each micro-batch's partition summaries union
    into the persisted state and re-prune, so state stays bounded at
    ~capacity rows forever. With capacity >= distinct values the
    streamed counters equal the exact batch counts with zero error;
    with a tight capacity the mergeable-summaries bound
    true ∈ [est, est + err] must hold for every surviving counter."""
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    _, batch = batch_events
    true_counts = {
        r.event_type: r.c
        for r in batch.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }

    for capacity, tag in ((64, "roomy"), (2, "tight")):
        target = str(tmp_path / f"ss_state_{tag}")
        ckpt = str(tmp_path / f"ss_ckpt_{tag}")
        stream = ev.read_event_stream(spark, event_source).select("event_type")

        def merge(bdf, epoch_id, target=target, capacity=capacity):
            summ = agg.space_saving_summaries(bdf, "event_type", capacity)
            sess = bdf.sparkSession
            try:
                prev = sess.read.parquet(target)
                summ = prev.unionByName(summ)
            except Exception:
                pass
            merged = agg.space_saving_merge(summ, capacity)
            merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
                target
            )

        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        state = spark.read.parquet(target)
        est = {
            r.value: r.est
            for r in state.filter(F.col("value").isNotNull()).collect()
        }
        err = state.agg(F.sum("err")).collect()[0][0]
        assert len(est) <= capacity
        if tag == "roomy":
            assert est == {k: v for k, v in true_counts.items()}
            assert err == 0
        else:
            assert err > 0
            for v, e in est.items():
                assert e <= true_counts[v] <= e + err, (v, e, err)
            # any value with true count > err must have survived
            for v, c in true_counts.items():
                if c > err:
                    assert v in est, (v, c, err)


@pytest.mark.slow
def test_streaming_incremental_clusters_match_batch(spark, tmp_path):
    """Near-dup CLUSTER MAINTENANCE as a stream: documents arrive in
    micro-batches (file source, one file per trigger); foreachBatch
    matches each batch against the already-indexed corpus (cross-side
    banding) plus itself (self pairs), folds the new pairs into the
    converged labels via connected_components_incremental, and appends
    the batch to the corpus state. The final label table must equal a
    FROM-SCRATCH batch clustering of the full corpus — the incremental
    == full-recompute contract (dedup_clusters_incremental's oracle),
    streamed. Pair discovery is identical on both paths by
    construction (same md5 minhash machinery), so the assert is exact.
    """
    from spark_cassandra_collabfiltering_spark.operators import dedup as dd

    # Planted corpus: two near-dup families spanning slices + singletons.
    base_a = "the quick brown fox jumps over the lazy dog again and again in the yard "
    base_b = "distributed systems fail in correlated ways when the network partitions "
    docs = [
        (0, base_a * 4 + "alpha"),
        (1, base_a * 4 + "bravo"),
        (6, base_b * 4 + "echo"),
        (2, "completely unrelated text about cooking pasta with garlic and olive oil"),
        (3, base_a * 4 + "charlie"),
        (7, base_b * 4 + "foxtrot"),
        (4, "another unique document discussing quarterly financial projections"),
        (5, base_a * 4 + "delta"),
        (8, "a third singleton on the topic of alpine hiking trails and weather"),
        (9, "fourth singleton text mentioning telescopes and the night sky only"),
    ]
    slices = [docs[0:3], docs[3:6], docs[6:10]]
    params = dict(n=4, n_hashes=16, bands=8, threshold=0.30, prefilter_matches=4)

    src = str(tmp_path / "docs_src")
    corpus_path = str(tmp_path / "corpus")
    labels_path = str(tmp_path / "labels")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    for i, sl in enumerate(slices):
        spark.createDataFrame(sl, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def fold(bdf, epoch_id):
        sess = bdf.sparkSession
        if bdf.isEmpty():
            return
        batch = bdf.localCheckpoint(eager=True)
        pairs = dd.minhash_dedup_pairs(
            batch, "doc_id", "text", max_band_bucket=64, oversize="star", **params
        ).select("id_a", "id_b")
        try:
            corpus = sess.read.parquet(corpus_path)
        except Exception:
            corpus = None
        if corpus is not None:
            cross = dd.incremental_minhash_pairs(
                corpus, batch, "doc_id", "text", **params
            ).select(
                F.col("batch_id").alias("id_a"), F.col("corpus_id").alias("id_b")
            )
            pairs = pairs.unionByName(cross)
        try:
            labels = sess.read.parquet(labels_path)
        except Exception:
            labels = None
        if labels is None:
            new_labels = dd.connected_components(pairs)
        else:
            new_labels = dd.connected_components_incremental(labels, pairs)
        new_labels.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            labels_path
        )
        batch.write.mode("append").parquet(corpus_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = sorted(
        (r.node, r.cluster_id) for r in spark.read.parquet(labels_path).collect()
    )
    full = spark.createDataFrame(docs, "doc_id long, text string")
    want_pairs = dd.minhash_dedup_pairs(
        full, "doc_id", "text", max_band_bucket=64, oversize="star", **params
    ).select("id_a", "id_b")
    want = sorted(
        (r.node, r.cluster_id) for r in dd.connected_components(want_pairs).collect()
    )
    assert streamed == want
    # the planted families actually clustered (non-vacuous)
    by_cluster: dict[int, set[int]] = {}
    for node, cid in streamed:
        by_cluster.setdefault(cid, set()).add(node)
    assert {0, 1, 3, 5} in by_cluster.values()
    assert {6, 7} in by_cluster.values()


def test_streaming_bottomk_sketch_merge_matches_batch(spark, event_source, batch_events, tmp_path):
    """The bottom-k rank-quantile sketch streamed: each micro-batch's
    state unions into parquet and re-caps via bottomk_merge; the final
    state — and the quantile estimates off it — equal the single-pass
    batch sketch exactly (mergeable-summaries contract, streamed)."""
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    _, batch = batch_events
    target = str(tmp_path / "bk_state")
    ckpt = str(tmp_path / "ckpt")
    stream = ev.read_event_stream(spark, event_source).select(
        "event_type", "event_id", "value"
    )

    def merge(bdf, epoch_id):
        st = agg.bottomk_sample(bdf, ["event_type"], "value", "event_id", k=64)
        sess = bdf.sparkSession
        try:
            st = sess.read.parquet(target).unionByName(st)
        except Exception:
            pass
        merged = agg.bottomk_merge(st, ["event_type"], k=64)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(target)
    want = agg.bottomk_sample(batch, ["event_type"], "value", "event_id", k=64)
    assert sorted(map(tuple, streamed.select("event_type", "value", "draw").collect())) == sorted(
        map(tuple, want.collect())
    )
    qs = agg.bottomk_quantiles(streamed, ["event_type"], (50, 90))
    qb = agg.bottomk_quantiles(want, ["event_type"], (50, 90))
    assert sorted(map(tuple, qs.collect())) == sorted(map(tuple, qb.collect()))


def test_streaming_kmv_sketch_merge_matches_batch(spark, event_source, batch_events, tmp_path):
    """The KMV distinct sketch streamed the same way (union states,
    keep k smallest distinct hashes per group); final state and the
    distinct estimates equal the batch sketch."""
    from pyspark.sql import Window

    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    _, batch = batch_events
    k = 64
    target = str(tmp_path / "kmv_state")
    ckpt = str(tmp_path / "ckpt")
    stream = ev.read_event_stream(spark, event_source).select(
        "event_type", "user_id"
    )

    def merge(bdf, epoch_id):
        st = agg.kmv_state(bdf, ["event_type"], "user_id", k=k)
        sess = bdf.sparkSession
        try:
            st = sess.read.parquet(target).unionByName(st).distinct()
        except Exception:
            pass
        w = Window.partitionBy("event_type").orderBy("h")
        merged = (
            st.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("event_type", "h")
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(target)
    want = agg.kmv_state(batch, ["event_type"], "user_id", k=k)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, want.collect()))
    es = agg.kmv_distinct(streamed, ["event_type"], k=k)
    eb = agg.kmv_distinct(want, ["event_type"], k=k)
    assert sorted(map(tuple, es.collect())) == sorted(map(tuple, eb.collect()))


def test_streaming_ivf_index_maintenance_matches_batch(spark, tmp_path):
    """ANN index maintenance as a stream: the coarse quantizer trains
    ONCE (on the initial corpus sample — the FAISS shape), then each
    arriving micro-batch of vectors is assigned to its nearest
    centroid map-only (fixed literal codebook) and appended to the
    cluster-partitioned index state. The streamed index must equal a
    batch-built index over the full corpus with the same codebook —
    ingest-time vector indexing with zero drift, and a probe query
    over the streamed state returns the batch answer."""
    from spark_cassandra_collabfiltering_spark.operators import similarity as sim
    from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table

    from conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    # fixed codebook from the full table (deterministic sampled trainer)
    _, centroids = sim.ivf_index(emb, n_clusters=8, seed=42, train_fraction=0.5)
    centers = [
        list(r.centroid) for r in centroids.orderBy("cluster").collect()
    ]

    src = str(tmp_path / "vec_src")
    state = str(tmp_path / "ivf_state")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def assign(bdf, epoch_id):
        out = bdf.select(
            "vec_id",
            "embedding",
            sim._nearest_code(
                F.col("embedding").cast("array<double>"), centers
            ).alias("cluster"),
        )
        out.write.mode("append").partitionBy("cluster").parquet(state)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(assign)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(state).select("vec_id", "cluster")
    batch = emb.select(
        "vec_id",
        sim._nearest_code(F.col("embedding").cast("array<double>"), centers).alias(
            "cluster"
        ),
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # probe equality end-to-end: nearest centroid's members, exact
    # cosine rerank, top-3 — streamed state vs batch state
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    import math

    def top3(assigned):
        best_c = min(
            range(len(centers)),
            key=lambda c: -sum(a * b for a, b in zip(centers[c], qvec)),
        )
        rows = assigned.filter(F.col("cluster") == best_c).join(
            emb, "vec_id"
        ).collect()
        def cos(v):
            num = sum(a * b for a, b in zip(v, qvec))
            den = math.sqrt(sum(a * a for a in v)) * math.sqrt(
                sum(b * b for b in qvec)
            )
            return num / den
        return sorted(
            ((round(cos(r.embedding), 9), r.vec_id) for r in rows),
            key=lambda x: (-x[0], x[1]),
        )[:3]

    assert top3(streamed) == top3(batch)
