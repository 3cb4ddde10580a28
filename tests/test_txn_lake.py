"""Transaction-log lake (r7): optimistic concurrency, conflict rules,
time travel by log replay, idempotent writer transactions, vacuum of
uncommitted garbage — the ACID semantics VERDICT r6 listed as the
manifest lake's missing layer, built on the one primitive every
object store gives (atomic create-if-absent)."""

import json
import os
import threading

import pytest

from spark_cassandra_collabfiltering_spark.sources import lake


def _rows(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = lake.txn_write(_rows(spark, 0, 5), root)
    v1 = lake.txn_write(_rows(spark, 5, 8), root)
    assert (v0, v1) == (0, 1)
    assert _ids(lake.txn_read(spark, root)) == list(range(8))
    assert _ids(lake.txn_read(spark, root, version=0)) == list(range(5))


def test_overwrite_resets_state_but_history_stays_readable(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 5), root)
    lake.txn_write(_rows(spark, 100, 103), root, mode="overwrite")
    assert _ids(lake.txn_read(spark, root)) == [100, 101, 102]
    assert _ids(lake.txn_read(spark, root, version=0)) == list(range(5))


def test_losing_append_rebases_and_both_survive(spark, tmp_path):
    # simulate the race deterministically: steal the loser's intended
    # version by committing v1 between its data write and its commit
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("1.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_write(_rows(spark, 50, 52), root)  # the winner
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        v = lake.txn_write(_rows(spark, 10, 12), root)
    finally:
        os.open = real_open
    assert v == 2  # rebased past the winner
    assert _ids(lake.txn_read(spark, root)) == [0, 1, 2, 10, 11, 50, 51]


def test_overwrite_losing_race_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("1.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_write(_rows(spark, 50, 52), root)
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        with pytest.raises(lake.ConcurrentWriteConflict):
            lake.txn_write(_rows(spark, 10, 12), root, mode="overwrite")
    finally:
        os.open = real_open


def test_append_across_committed_overwrite_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("1.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_write(_rows(spark, 50, 52), root, mode="overwrite")
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        with pytest.raises(lake.ConcurrentWriteConflict):
            lake.txn_write(_rows(spark, 10, 12), root)
    finally:
        os.open = real_open


def test_idempotent_txn_replay_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    v = lake.txn_write(_rows(spark, 0, 3), root, txn=("ingest", 7))
    assert v == 0
    assert lake.txn_write(_rows(spark, 0, 3), root, txn=("ingest", 7)) is None
    assert lake.txn_latest_version(root) == 0
    assert _ids(lake.txn_read(spark, root)) == [0, 1, 2]
    # a different run id commits normally
    assert lake.txn_write(_rows(spark, 3, 5), root, txn=("ingest", 8)) == 1


def test_uncommitted_data_is_invisible_and_vacuumable(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    # writer crashed after data, before commit: plant orphan files
    orphan = os.path.join(root, "_data", "deadbeef")
    _rows(spark, 90, 95).write.parquet(orphan)
    assert _ids(lake.txn_read(spark, root)) == [0, 1, 2]
    removed = lake.txn_vacuum(root)
    assert removed and all("deadbeef" in p for p in removed)
    assert _ids(lake.txn_read(spark, root)) == [0, 1, 2]
    # committed files never vacuumed — time travel intact
    assert _ids(lake.txn_read(spark, root, version=0)) == [0, 1, 2]


def test_concurrent_threads_commit_contiguously(spark, tmp_path):
    # 8 threads race appends through the real O_EXCL path; every commit
    # must land, versions contiguous, all rows present exactly once
    root = str(tmp_path / "t")
    dfs = [_rows(spark, i * 10, i * 10 + 3) for i in range(8)]
    for d in dfs:
        d.localCheckpoint()  # materialize before the race
    errs = []

    def work(d):
        try:
            lake.txn_write(d, root)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=work, args=(d,)) for d in dfs]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    assert lake.txn_latest_version(root) == 7
    want = sorted(x for i in range(8) for x in range(i * 10, i * 10 + 3))
    assert _ids(lake.txn_read(spark, root)) == want
    # log metadata is well-formed: read_version < version for all
    for v in range(8):
        c = json.load(open(os.path.join(root, "_log", f"{v:020d}.json")))
        assert c["version"] == v
        assert c["op"] == "append"


# --------------------------------------------------------------------
# r7 continuation: checkpoints, compaction, exactly-once stream sink
# --------------------------------------------------------------------


def test_checkpoint_written_and_state_matches_full_replay(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 4)
    root = str(tmp_path / "t")
    for i in range(9):  # versions 0..8 -> checkpoints at 4 and 8
        lake.txn_write(_rows(spark, i * 10, i * 10 + 2), root)
    assert os.path.exists(lake._checkpoint_path(root, 4))
    assert os.path.exists(lake._checkpoint_path(root, 8))
    # state computed through the checkpoint == brute-force replay
    want = []
    for v in range(9):
        want = lake._apply_commit(want, lake._read_commit(root, v))
    assert lake._txn_state(root, 8) == want
    # pinned reads below the checkpoint still replay correctly
    assert _ids(lake.txn_read(spark, root, version=2)) == sorted(
        x for i in range(3) for x in (i * 10, i * 10 + 1)
    )


def test_torn_checkpoint_is_ignored(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    for i in range(5):
        lake.txn_write(_rows(spark, i * 10, i * 10 + 2), root)
    # corrupt the newest checkpoint: readers must fall back cleanly
    with open(lake._checkpoint_path(root, 4), "w") as fh:
        fh.write("{ torn json")
    assert len(_ids(lake.txn_read(spark, root))) == 10
    # idempotency scan also survives the torn cache
    assert lake.txn_write(_rows(spark, 50, 52), root, txn=("a", 1)) == 5
    assert lake.txn_write(_rows(spark, 50, 52), root, txn=("a", 1)) is None


def test_checkpoint_carries_txns_for_idempotency(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 2), root, txn=("app", 1))
    lake.txn_write(_rows(spark, 2, 4), root, txn=("app", 2))
    lake.txn_write(_rows(spark, 4, 6), root, txn=("app", 3))
    cp = json.load(open(lake._checkpoint_path(root, 2)))
    assert ["app", 1] in cp["txns"] and ["app", 3] in cp["txns"]
    # replay of a pre-checkpoint txn is still a no-op
    assert lake.txn_write(_rows(spark, 0, 2), root, txn=("app", 1)) is None


def test_compact_coalesces_files_data_and_history_intact(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        lake.txn_write(_rows(spark, i * 10, i * 10 + 3), root)
    n_before = len(lake._txn_state(root, 3))
    v = lake.txn_compact(spark, root)
    assert v == 4
    after = lake._txn_state(root, 4)
    assert len(after) < n_before
    want = sorted(x for i in range(4) for x in range(i * 10, i * 10 + 3))
    assert _ids(lake.txn_read(spark, root)) == want
    # time travel to the pre-compact layout still reads the old files
    assert _ids(lake.txn_read(spark, root, version=3)) == want
    # nothing left to compact -> no-op
    assert lake.txn_compact(spark, root) is None
    # vacuum keeps everything (old files live via time travel)
    assert lake.txn_vacuum(root) == []


def test_append_rebases_past_concurrent_compact(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    lake.txn_write(_rows(spark, 10, 13), root)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen["done"]:
            stolen["done"] = True
            assert lake.txn_compact(spark, root) == 2  # maintenance wins v2
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        v = lake.txn_write(_rows(spark, 20, 23), root)
    finally:
        os.open = real_open
    assert v == 3  # rebased past the compact, no conflict
    assert _ids(lake.txn_read(spark, root)) == [0, 1, 2, 10, 11, 12, 20, 21, 22]


def test_concurrent_overlapping_compacts_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    lake.txn_write(_rows(spark, 10, 13), root)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_compact(spark, root)  # rewrites the same victims
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        with pytest.raises(lake.ConcurrentWriteConflict):
            lake.txn_compact(spark, root)
    finally:
        os.open = real_open
    # the table is still consistent at the winner's layout
    assert _ids(lake.txn_read(spark, root)) == [0, 1, 2, 10, 11, 12]


def test_txn_history_shape(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    lake.txn_write(_rows(spark, 3, 6), root, txn=("ingest", 42))
    lake.txn_compact(spark, root)
    h = lake.txn_history(root)
    assert [e["version"] for e in h] == [2, 1, 0]
    assert [e["op"] for e in h] == ["compact", "append", "append"]
    assert h[0]["n_removes"] == h[1]["n_files"] + h[2]["n_files"]
    assert h[1]["txn"] == ("ingest", 42)


def test_stream_sink_exactly_once_replayed_epoch_is_noop(spark, tmp_path):
    # the foreachBatch contract: Spark may call the sink again with the
    # SAME epoch_id after a failure; the txn key must absorb the replay
    root = str(tmp_path / "t")
    sink = lake.txn_stream_sink(root, "q1")
    sink(_rows(spark, 0, 5), 0)
    sink(_rows(spark, 5, 8), 1)
    sink(_rows(spark, 5, 8), 1)  # replay after a lost commit outcome
    sink(_rows(spark, 8, 10), 2)
    assert _ids(lake.txn_read(spark, root)) == list(range(10))
    assert lake.txn_latest_version(root) == 2


def test_stream_sink_end_to_end_restart_continues_epochs(spark, tmp_path):
    """Real writeStream drains: run availableNow over a file source,
    land more files, restart from the SAME engine checkpoint with the
    same txn app — the second drain appends only the new slice, and a
    third drain with nothing new commits nothing."""
    from pyspark.sql import functions as F

    src, ckpt, root = (str(tmp_path / d) for d in ("src", "ck", "t"))
    os.makedirs(src, exist_ok=True)
    _rows(spark, 0, 6).coalesce(1).write.mode("append").parquet(src)

    schema = "id BIGINT, v BIGINT"

    def drain():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(lake.txn_stream_sink(root, "soak"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert _ids(lake.txn_read(spark, root)) == list(range(6))
    _rows(spark, 6, 9).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert _ids(lake.txn_read(spark, root)) == list(range(9))
    v_after_two = lake.txn_latest_version(root)
    drain()  # no new input: no new commit
    assert lake.txn_latest_version(root) == v_after_two
    assert _ids(lake.txn_read(spark, root)) == list(range(9))


# --------------------------------------------------------------------
# r7 continuation 2: commit-embedded add-file stats + data skipping
# --------------------------------------------------------------------


def test_stats_pruning_skips_provably_irrelevant_files(spark, tmp_path):
    root = str(tmp_path / "t")
    # three appends with disjoint id ranges, one file each
    for lo, hi in [(0, 10), (100, 110), (200, 210)]:
        lake.txn_write(
            _rows(spark, lo, hi).coalesce(1), root, stats_cols=["id"]
        )
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 100, 105)
    assert (nread, ntotal) == (1, 3)
    assert _ids(df) == list(range(100, 106))
    # a range spanning two files reads exactly two
    df, nread, _ = lake.txn_read_pruned(spark, root, "id", 9, 101)
    assert nread == 2
    assert _ids(df) == [9, 100, 101]
    # a range missing every file opens none but keeps the schema
    df, nread, _ = lake.txn_read_pruned(spark, root, "id", 500, 600)
    assert nread == 0 and df.count() == 0 and df.columns == ["id", "v"]


def test_files_without_stats_are_always_scanned(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 10).coalesce(1), root, stats_cols=["id"])
    lake.txn_write(_rows(spark, 100, 110).coalesce(1), root)  # no stats
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 105, 106)
    # the no-proof file must be scanned even though only it can match
    assert (nread, ntotal) == (1, 2)
    assert _ids(df) == [105, 106]


def test_all_null_stats_chunk_is_kept(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    nulls = spark.range(3).select(
        F.lit(None).cast("long").alias("id"), F.col("id").alias("v")
    )
    lake.txn_write(nulls.coalesce(1), root, stats_cols=["id"])
    lake.txn_write(_rows(spark, 0, 5).coalesce(1), root, stats_cols=["id"])
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 2, 3)
    assert (nread, ntotal) == (2, 2)  # NULL-range file cannot be pruned
    assert _ids(df) == [2, 3]


def test_checkpoint_carries_stats_pruning_survives_it(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 3)
    root = str(tmp_path / "t")
    for i in range(7):  # checkpoints at 3 and 6
        lake.txn_write(
            _rows(spark, i * 100, i * 100 + 5).coalesce(1),
            root,
            stats_cols=["id"],
        )
    cp = json.load(open(lake._checkpoint_path(root, 6)))
    assert len(cp["stats"]) == 7
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 200, 204)
    assert (nread, ntotal) == (1, 7)  # pre-checkpoint file still pruned by
    assert _ids(df) == list(range(200, 205))


def test_compact_with_stats_repopulates_skipping(spark, tmp_path):
    root = str(tmp_path / "t")
    for lo in (0, 100, 200):
        lake.txn_write(
            _rows(spark, lo, lo + 5).coalesce(1), root, stats_cols=["id"]
        )
    lake.txn_compact(spark, root, stats_cols=["id"])
    files, _, stats = lake._replay(root, lake.txn_latest_version(root))[:3]
    assert len(files) == 1 and set(stats) == set(files)
    assert stats[files[0]]["id"] == [0, 204]
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 100, 104)
    assert (nread, ntotal) == (1, 1)
    assert _ids(df) == list(range(100, 105))
    # pruning at the pre-compact version still sees the old stats
    df, nread, ntotal = lake.txn_read_pruned(
        spark, root, "id", 100, 104, version=2
    )
    assert (nread, ntotal) == (1, 3)


# --------------------------------------------------------------------
# r7 continuation 3: schema enforcement + evolution
# --------------------------------------------------------------------


def test_divergent_append_rejected_before_data_write(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    bad = spark.range(3).select(F.col("id"), F.col("id").alias("other"))
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_write(bad, root)
    # fail-fast: no data garbage was written, no version consumed
    assert lake.txn_latest_version(root) == 0
    assert lake.txn_vacuum(root) == []
    # a LOSSLESS-narrower write implicitly upcasts (int into a long
    # column — the Delta implicit-cast contract that keeps narrow
    # writers working after a type widening) ...
    retyped = spark.range(3).select(
        F.col("id").cast("int"), (F.col("id") * 2).alias("v")
    )
    v = lake.txn_write(retyped, root)
    assert lake.txn_read(spark, root).count() == 6
    # ... while a genuinely incompatible type change is still rejected
    # even under merge_schema
    bad_type = spark.range(3).select(
        F.col("id").cast("string"), (F.col("id") * 2).alias("v")
    )
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_write(bad_type, root, merge_schema=True)


def test_merge_schema_adds_nullable_column_old_files_read_null(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    wide = _rows(spark, 3, 6).withColumn("w", F.col("id") + 100)
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_write(wide, root)  # evolution must be explicit
    lake.txn_write(wide, root, merge_schema=True)
    df = lake.txn_read(spark, root)
    assert df.columns == ["id", "v", "w"]
    got = {r["id"]: r["w"] for r in df.collect()}
    assert got == {0: None, 1: None, 2: None, 3: 103, 4: 104, 5: 105}
    # post-evolution appends must carry the evolved schema
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_write(_rows(spark, 6, 9), root)
    # ...unless merge_schema tolerates the absent column
    lake.txn_write(_rows(spark, 6, 9), root, merge_schema=True)
    assert lake.txn_read(spark, root).filter("id = 7").collect()[0]["w"] is None
    # a pinned pre-evolution read presents the ORIGINAL schema
    assert lake.txn_read(spark, root, version=0).columns == ["id", "v"]


def test_column_order_and_nullability_do_not_conflict(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    reordered = spark.range(3, 6).select(
        (F.col("id") * 2).alias("v"), F.col("id")
    )
    lake.txn_write(reordered, root)  # same name->type set: no mismatch
    df = lake.txn_read(spark, root)
    assert sorted(df.columns) == ["id", "v"]
    assert df.count() == 6


def test_overwrite_resets_schema(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    fresh = spark.range(3).select(F.col("id").alias("doc"), F.lit("x").alias("s"))
    lake.txn_write(fresh, root, mode="overwrite")
    assert lake.txn_read(spark, root).columns == ["doc", "s"]
    lake.txn_write(fresh, root)  # appends now check against the new schema
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_write(_rows(spark, 0, 3), root)


def test_evolution_survives_compact_and_checkpoint(spark, tmp_path, monkeypatch):
    from pyspark.sql import functions as F

    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 3)
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    lake.txn_write(
        _rows(spark, 3, 6).withColumn("w", F.col("id") + 100),
        root,
        merge_schema=True,
    )
    lake.txn_write(_rows(spark, 6, 9), root, merge_schema=True)
    v = lake.txn_compact(spark, root)  # v3 -> checkpoint at 3
    assert v == 3
    assert os.path.exists(lake._checkpoint_path(root, 3))
    df = lake.txn_read(spark, root)
    assert df.columns == ["id", "v", "w"]
    got = {r["id"]: r["w"] for r in df.collect()}
    assert got[4] == 104 and got[0] is None and got[8] is None
    # compacted files are uniform: replay says one schema, plain scan OK
    st = lake._replay(root, 3)
    assert len({st.file_schemas[f] for f in st.files}) == 1


# --------------------------------------------------------------------
# r7 continuation 4: copy-on-write MERGE INTO (the Delta MERGE shape)
# --------------------------------------------------------------------


def _kv(df):
    return {r["id"]: r["v"] for r in df.collect()}


def _seed_three_files(spark, root):
    """Three one-file appends with disjoint id ranges + key stats."""
    for lo, hi in [(0, 10), (100, 110), (200, 210)]:
        lake.txn_write(
            _rows(spark, lo, hi).coalesce(1), root, stats_cols=["id"]
        )


def test_merge_upsert_updates_matched_inserts_unmatched(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    src = spark.createDataFrame(
        [(105, -1), (106, -2), (500, -3)], "id long, v long"
    )
    v, rewritten, total = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"]
    )
    assert v == 3 and total == 3
    got = _kv(lake.txn_read(spark, root))
    assert got[105] == -1 and got[106] == -2 and got[500] == -3
    assert got[104] == 208 and got[0] == 0 and got[205] == 410
    assert len(got) == 31  # 30 seeded + 1 insert
    # time travel: the pre-merge snapshot is untouched
    assert _kv(lake.txn_read(spark, root, version=2))[105] == 210
    h = lake.txn_history(root)[0]
    # per-key pruning: keys {105, 106, 500} fit only the [100, 109]
    # file — [200, 209] is NOT dragged in by the overall range span
    assert h["op"] == "merge" and h["n_removes"] == 1


def test_merge_rewrites_only_files_that_can_match(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    before = set(lake._txn_state(root, 2))
    src = spark.createDataFrame([(105, -1)], "id long, v long")
    v, rewritten, total = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"]
    )
    assert (rewritten, total) == (1, 3)
    after = set(lake._txn_state(root, v))
    # the two provably-unmatchable files survive AS THE SAME paths
    assert len(before & after) == 2
    removed = json.load(
        open(os.path.join(lake._log_dir(root), f"{v:020d}.json"))
    )["removes"]
    mn_mx = lake._replay(root, 2).stats[removed[0]]["id"]
    assert mn_mx == [100, 109]


def test_merge_delete_accepts_keys_only_tombstone_feed(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    tombstones = spark.createDataFrame([(0,), (9,), (205,)], "id long")
    v, rewritten, total = lake.txn_merge(
        spark, root, tombstones, ["id"],
        when_matched="delete", when_not_matched="ignore",
        stats_cols=["id"],
    )
    assert rewritten == 2  # files 1 and 3 hold the victims
    ids = _ids(lake.txn_read(spark, root))
    assert 0 not in ids and 9 not in ids and 205 not in ids
    assert len(ids) == 27


def test_merge_update_only_ignores_unmatched_source_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    src = spark.createDataFrame([(7, -7), (999, -9)], "id long, v long")
    v, _, _ = lake.txn_merge(
        spark, root, src, ["id"], when_not_matched="ignore",
        stats_cols=["id"],
    )
    got = _kv(lake.txn_read(spark, root))
    assert got[7] == -7 and 999 not in got and len(got) == 30


def test_merge_duplicate_source_keys_raise(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    dup = spark.createDataFrame([(5, 1), (5, 2)], "id long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        lake.txn_merge(spark, root, dup, ["id"])
    # delete mode tolerates duplicates (tombstones are idempotent)
    v, _, _ = lake.txn_merge(
        spark, root, dup.select("id"), ["id"],
        when_matched="delete", when_not_matched="ignore",
    )
    assert 5 not in _ids(lake.txn_read(spark, root))


def test_merge_empty_source_and_no_match_ignore_are_noops(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    empty = spark.createDataFrame([], "id long, v long")
    assert lake.txn_merge(spark, root, empty, ["id"])[0] is None
    far = spark.createDataFrame([(10_000, 0)], "id long, v long")
    v, rewritten, _ = lake.txn_merge(
        spark, root, far, ["id"], when_not_matched="ignore"
    )
    assert v is None and rewritten == 0
    assert lake.txn_latest_version(root) == 2  # nothing committed


def test_merge_into_empty_table_is_insert(spark, tmp_path):
    root = str(tmp_path / "t")
    src = spark.createDataFrame([(1, 10)], "id long, v long")
    v, _, _ = lake.txn_merge(spark, root, src, ["id"], stats_cols=["id"])
    assert v == 0 and _kv(lake.txn_read(spark, root)) == {1: 10}


def test_merge_schema_must_match_table(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    src = spark.createDataFrame([(5,)], "id long").withColumn(
        "extra", F.lit(1)
    )
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_merge(spark, root, src, ["id"])


def test_merge_rebases_past_disjoint_append_write_serializable(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    # steal the merge's version between its read and its commit
    orig = lake._write_data_files

    def hijack(df, r, *a, **k):
        files = orig(df, r, *a, **k)
        if not getattr(hijack, "done", False):
            hijack.done = True
            lake.txn_write(
                _rows(spark, 300, 305).coalesce(1), root, stats_cols=["id"]
            )
        return files

    monkeypatch.setattr(lake, "_write_data_files", hijack)
    src = spark.createDataFrame([(105, -1)], "id long, v long")
    v, _, _ = lake.txn_merge(spark, root, src, ["id"], stats_cols=["id"])
    assert v == 4  # rebased past the concurrent append at v3
    got = _kv(lake.txn_read(spark, root))
    assert got[105] == -1 and got[300] == 600  # both writes survive


def test_merge_serializable_conflicts_with_overlapping_gap_append(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    orig = lake._write_data_files

    def hijack(df, r, *a, **k):
        files = orig(df, r, *a, **k)
        if not getattr(hijack, "done", False):
            hijack.done = True
            # gap append whose id range CONTAINS the merged key
            lake.txn_write(
                _rows(spark, 104, 107).coalesce(1), root, stats_cols=["id"]
            )
        return files

    monkeypatch.setattr(lake, "_write_data_files", hijack)
    src = spark.createDataFrame([(105, -1)], "id long, v long")
    with pytest.raises(lake.ConcurrentWriteConflict, match="may hold"):
        lake.txn_merge(
            spark, root, src, ["id"], stats_cols=["id"], serializable=True
        )


def test_merge_serializable_rebases_past_provably_disjoint_append(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    orig = lake._write_data_files

    def hijack(df, r, *a, **k):
        files = orig(df, r, *a, **k)
        if not getattr(hijack, "done", False):
            hijack.done = True
            lake.txn_write(
                _rows(spark, 900, 905).coalesce(1), root, stats_cols=["id"]
            )
        return files

    monkeypatch.setattr(lake, "_write_data_files", hijack)
    src = spark.createDataFrame([(105, -1)], "id long, v long")
    v, _, _ = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"], serializable=True
    )
    assert v == 4
    assert _kv(lake.txn_read(spark, root))[105] == -1


def test_concurrent_merge_and_compact_overlapping_files_conflict(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    orig = lake._write_data_files
    calls = {"n": 0}

    def hijack(df, r, *a, **k):
        files = orig(df, r, *a, **k)
        calls["n"] += 1
        if calls["n"] == 1:  # only on the merge's own data write
            monkeypatch.setattr(lake, "_write_data_files", orig)
            lake.txn_compact(spark, root)  # rewrites ALL three files
        return files

    monkeypatch.setattr(lake, "_write_data_files", hijack)
    src = spark.createDataFrame([(105, -1)], "id long, v long")
    with pytest.raises(lake.ConcurrentWriteConflict, match="overlapping"):
        lake.txn_merge(spark, root, src, ["id"], stats_cols=["id"])


def test_merge_large_source_falls_back_to_range_proof(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(lake, "MERGE_PRUNE_MAX_KEYS", 1)
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    tombstones = spark.createDataFrame([(0,), (205,)], "id long")
    v, rewritten, total = lake.txn_merge(
        spark, root, tombstones, ["id"],
        when_matched="delete", when_not_matched="ignore",
        stats_cols=["id"],
    )
    # range [0, 205] overlaps all three files — conservative but correct
    assert (rewritten, total) == (3, 3)
    ids = _ids(lake.txn_read(spark, root))
    assert 0 not in ids and 205 not in ids and len(ids) == 28


def test_merge_idempotent_txn_replay_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    src = spark.createDataFrame([(5, -5)], "id long, v long")
    v, _, _ = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"], txn=("cdc", 3)
    )
    assert v == 3
    # replay of the same (app, run): no-op, no new version
    v2, _, _ = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"], txn=("cdc", 3)
    )
    assert v2 is None and lake.txn_latest_version(root) == 3
    assert _kv(lake.txn_read(spark, root))[5] == -5


@pytest.mark.slow
def test_cdc_sink_exactly_once_upsert_and_replay(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    sink = lake.txn_cdc_sink(root, "cdc", ["id"], stats_cols=["id"])
    sink(spark.createDataFrame([(0, -1), (999, -2)], "id long, v long"), 0)
    sink(spark.createDataFrame([(999, -3)], "id long, v long"), 1)
    sink(spark.createDataFrame([(999, -3)], "id long, v long"), 1)  # replay
    got = _kv(lake.txn_read(spark, root))
    assert got[0] == -1 and got[999] == -3 and len(got) == 31
    assert lake.txn_latest_version(root) == 4  # 3 seeds + 2 merges


def test_cdc_sink_end_to_end_stream_applies_last_change_per_key(
    spark, tmp_path
):
    """Real writeStream drain: a CDC file feed upserted into the txn
    table via foreachBatch merge; restart drains only the new slice."""
    from pyspark.sql import functions as F

    src, ckpt, root = (str(tmp_path / d) for d in ("src", "ck", "t"))
    os.makedirs(src, exist_ok=True)
    lake.txn_write(_rows(spark, 0, 5).coalesce(1), root, stats_cols=["id"])

    spark.createDataFrame(
        [(2, -2), (50, -50)], "id long, v long"
    ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema("id BIGINT, v BIGINT").parquet(src)
            .writeStream.foreachBatch(
                lake.txn_cdc_sink(root, "cdc-e2e", ["id"], stats_cols=["id"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = _kv(lake.txn_read(spark, root))
    assert got[2] == -2 and got[50] == -50 and len(got) == 6
    spark.createDataFrame(
        [(50, -51)], "id long, v long"
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    got = _kv(lake.txn_read(spark, root))
    assert got[50] == -51 and len(got) == 6


# --------------------------------------------------------------------
# r7 continuation 5: deletion vectors (delete without rewriting files)
# --------------------------------------------------------------------


def test_dv_deletes_rows_without_touching_data_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    files_before = list(lake._txn_state(root, 2))
    v, n_deleted, n_cand = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(3,), (105,)], "id long"), ["id"]
    )
    assert v == 3 and n_deleted == 2 and n_cand == 2  # per-key pruning
    # the data file set is IDENTICAL — only a sidecar was added
    assert lake._txn_state(root, 3) == files_before
    ids = _ids(lake.txn_read(spark, root))
    assert 3 not in ids and 105 not in ids and len(ids) == 28
    # time travel: pre-DV version still shows the rows
    assert 3 in _ids(lake.txn_read(spark, root, version=2))
    assert lake.txn_history(root)[0]["op"] == "dv"


@pytest.mark.slow
def test_dv_compose_and_pruned_read_respects_them(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(100,)], "id long"), ["id"]
    )
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(101,)], "id long"), ["id"]
    )
    ids = _ids(lake.txn_read(spark, root))
    assert 100 not in ids and 101 not in ids and len(ids) == 28
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 100, 104)
    assert (nread, ntotal) == (1, 3)
    assert _ids(df) == [102, 103, 104]  # DV applies inside pruned reads


def test_compact_materializes_dvs_away(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,), (205,)], "id long"), ["id"]
    )
    v = lake.txn_compact(spark, root, stats_cols=["id"])
    assert v == 4
    st = lake._replay(root, v)
    assert st.dvs == []  # rewritten targets -> sidecars inert, pruned
    ids = _ids(lake.txn_read(spark, root))
    assert 5 not in ids and 205 not in ids and len(ids) == 28
    # and the compacted file's stats reflect the survivors
    assert st.stats[st.files[0]]["id"] == [0, 209]


@pytest.mark.slow
def test_merge_rewrite_does_not_resurrect_dv_deleted_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(104,)], "id long"), ["id"]
    )
    src = spark.createDataFrame([(105, -1)], "id long, v long")
    v, rewritten, _ = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"]
    )
    assert rewritten == 1
    got = _kv(lake.txn_read(spark, root))
    assert 104 not in got and got[105] == -1 and len(got) == 29
    assert lake._replay(root, v).dvs == []  # target rewritten -> inert


@pytest.mark.slow
def test_dv_conflicts_with_concurrent_compact_both_directions(
    spark, tmp_path, monkeypatch
):
    # direction 1: the DV loses the race to a compact of its targets
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    orig = lake._write_data_files
    done = {"x": False}

    def hijack(df, r, *a, **k):
        files = orig(df, r, *a, **k)
        if not done["x"]:
            done["x"] = True
            monkeypatch.setattr(lake, "_write_data_files", orig)
            lake.txn_compact(spark, root, stats_cols=["id"])
        return files

    monkeypatch.setattr(lake, "_write_data_files", hijack)
    with pytest.raises(lake.ConcurrentWriteConflict, match="touched"):
        lake.txn_delete_dv(
            spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
        )


@pytest.mark.slow
def test_compact_conflicts_with_concurrent_dv(spark, tmp_path, monkeypatch):
    # direction 2: a compact computed WITHOUT a freshly-committed DV
    # would resurrect the deleted rows — it must conflict
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    orig = lake._write_data_files
    done = {"x": False}

    def hijack(df, r, *a, **k):
        files = orig(df, r, *a, **k)
        if not done["x"]:
            done["x"] = True
            monkeypatch.setattr(lake, "_write_data_files", orig)
            lake.txn_delete_dv(
                spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
            )
        return files

    monkeypatch.setattr(lake, "_write_data_files", hijack)
    with pytest.raises(lake.ConcurrentWriteConflict, match="touched"):
        lake.txn_compact(spark, root, stats_cols=["id"])


@pytest.mark.slow
def test_append_rebases_past_dv_and_vacuum_keeps_sidecars(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(7,)], "id long"), ["id"]
    )
    lake.txn_write(_rows(spark, 300, 303).coalesce(1), root, stats_cols=["id"])
    ids = _ids(lake.txn_read(spark, root))
    assert 7 not in ids and 300 in ids
    removed = lake.txn_vacuum(root)
    assert removed == []  # sidecars and data files all live
    assert 7 not in _ids(lake.txn_read(spark, root))


@pytest.mark.slow
def test_dv_checkpoint_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 4)
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    lake.txn_write(_rows(spark, 300, 303).coalesce(1), root)  # v4 -> ckpt
    assert os.path.exists(lake._checkpoint_path(root, 4))
    cp = json.load(open(lake._checkpoint_path(root, 4)))
    assert cp["dvs"]  # the active DV survives the checkpoint
    assert 5 not in _ids(lake.txn_read(spark, root))


def test_dv_no_match_is_noop_and_idempotent_txn(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    v, n, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(104,)], "id long"), ["id"],
        txn=("purge", 1),
    )
    assert v == 3 and n == 1
    v2, n2, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(104,)], "id long"), ["id"],
        txn=("purge", 1),
    )
    assert v2 is None and n2 == 0  # replay absorbed
    # a genuinely-unmatched key commits nothing
    v3, n3, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(99999,)], "id long"), ["id"]
    )
    assert v3 is None and n3 == 0
    assert lake.txn_latest_version(root) == 3


def test_clustered_compact_restores_disjoint_stats_and_pruning(
    spark, tmp_path
):
    """Interleaved appends -> every file's range spans everything ->
    pruning skips nothing. sort_cols compaction range-clusters the
    rewrite: files get DISJOINT stats and point reads open one file."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    # 4 appends, each striping across the whole key space (mod layout)
    for k in range(4):
        df = (
            spark.range(0, 400)
            .filter(F.col("id") % 4 == k)
            .select("id", (F.col("id") * 2).alias("v"))
        )
        lake.txn_write(df.coalesce(1), root, stats_cols=["id"])
    _, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 10, 11)
    assert (nread, ntotal) == (4, 4)  # interleaved: nothing prunable
    v = lake.txn_compact(
        spark, root, stats_cols=["id"], sort_cols=["id"], n_files=4
    )
    st = lake._replay(root, v)
    assert len(st.files) == 4
    ranges = sorted(tuple(st.stats[f]["id"]) for f in st.files)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # provably disjoint after clustering
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 10, 11)
    assert (nread, ntotal) == (1, 4)  # point read opens ONE file
    assert _ids(df) == [10, 11]
    assert _ids(lake.txn_read(spark, root)) == list(range(400))


# --------------------------------------------------------------------
# r7 continuation 6: change data feed derived from the log
# --------------------------------------------------------------------


def _changes(spark, root, v_from, v_to=None):
    rows = lake.txn_changes(spark, root, v_from, v_to).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in rows
    )


def test_changes_per_op_shapes(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)  # v0..v2 appends
    # v3: merge upsert — update 105, insert 500
    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(105, -1), (500, -5)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    # v4: DV delete of 7
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(7,)], "id long"), ["id"]
    )
    # v5: compact — no logical change
    lake.txn_compact(spark, root, stats_cols=["id"])
    assert lake.txn_latest_version(root) == 5

    # append version: pure inserts
    ch0 = _changes(spark, root, 0, 0)
    assert ch0 == [(0, "insert", i, 2 * i) for i in range(10)]
    # merge version: identical rewritten rows CANCEL — only true churn
    ch3 = _changes(spark, root, 3, 3)
    assert ch3 == [
        (3, "delete", 105, 210),
        (3, "insert", 105, -1),
        (3, "insert", 500, -5),
    ]
    # dv version: exactly the deleted row
    assert _changes(spark, root, 4, 4) == [(4, "delete", 7, 14)]
    # compact version: empty feed
    assert _changes(spark, root, 5, 5) == []


@pytest.mark.slow
def test_changes_replay_reconstructs_any_snapshot(spark, tmp_path):
    """The algebraic contract: snapshot(v0) + inserts − deletes over
    (v0, vN] == snapshot(vN), as multisets."""
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(0, -9), (777, 1)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(105,), (777,)], "id long"), ["id"]
    )
    lake.txn_compact(spark, root, stats_cols=["id"])
    lake.txn_write(_rows(spark, 300, 303).coalesce(1), root, stats_cols=["id"])
    v_n = lake.txn_latest_version(root)

    base = lake.txn_read(spark, root, version=0).select("id", "v")
    feed = lake.txn_changes(spark, root, 1, v_n)
    ins = feed.filter("_change_type = 'insert'").select("id", "v")
    dels = feed.filter("_change_type = 'delete'").select("id", "v")
    replayed = base.unionByName(ins).exceptAll(dels)
    want = lake.txn_read(spark, root, version=v_n).select("id", "v")
    assert replayed.exceptAll(want).count() == 0
    assert want.exceptAll(replayed).count() == 0


def test_changes_second_dv_on_same_file_reports_only_new_rows(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(100,)], "id long"), ["id"]
    )
    # same file, overlapping tombstone set {100, 101}: 100 already gone
    lake.txn_delete_dv(
        spark, root,
        spark.createDataFrame([(100,), (101,)], "id long"), ["id"],
    )
    assert _changes(spark, root, 4, 4) == [(4, "delete", 101, 202)]


def test_changes_overwrite_and_empty_range(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3).coalesce(1), root)
    lake.txn_write(_rows(spark, 10, 12).coalesce(1), root, mode="overwrite")
    ch = _changes(spark, root, 1, 1)
    assert ch == [
        (1, "delete", 0, 0), (1, "delete", 1, 2), (1, "delete", 2, 4),
        (1, "insert", 10, 20), (1, "insert", 11, 22),
    ]
    with pytest.raises(ValueError):
        lake.txn_changes(spark, root, 0, 5)


@pytest.mark.slow
def test_incremental_view_maintenance_over_change_feed(spark, tmp_path):
    """The CDF consumer pattern: a downstream aggregate (sum(v), count
    per id-bucket) maintained from txn_changes deltas alone — reading
    ONLY changed files — equals a full recompute at every step."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    _seed_three_files(spark, root)  # v0..v2

    def full(v):
        return (
            lake.txn_read(spark, root, version=v)
            .groupBy((F.col("id") % 7).alias("b"))
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )

    # materialized state at v2
    state = full(2)

    def advance(state, v_lo, v_hi):
        feed = lake.txn_changes(spark, root, v_lo, v_hi)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = (
            feed.groupBy((F.col("id") % 7).alias("b"))
            .agg(
                F.sum(sign * F.col("v")).alias("ds"),
                F.sum(sign).alias("dn"),
            )
        )
        merged = (
            state.join(delta, "b", "full_outer")
            .select(
                "b",
                (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("s"),
                (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            )
            .filter(F.col("n") > 0)
        )
        return merged

    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(105, -1), (888, 3)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )  # v3
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(0,), (888,)], "id long"), ["id"]
    )  # v4
    state = advance(state, 3, 4)
    assert state.exceptAll(full(4)).count() == 0
    assert full(4).exceptAll(state).count() == 0

    lake.txn_write(_rows(spark, 400, 410).coalesce(1), root, stats_cols=["id"])  # v5
    state = advance(state, 5, 5)
    assert state.exceptAll(full(5)).count() == 0
    assert full(5).exceptAll(state).count() == 0


def test_incremental_reader_pages_through_commits_exactly_once(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    df0, cur = lake.txn_read_incremental(spark, root, None)
    assert df0 is None and cur == -1  # nothing yet
    _seed_three_files(spark, root)
    feed, cur = lake.txn_read_incremental(spark, root, cur)
    assert cur == 2 and feed.count() == 30
    assert set(r["_change_type"] for r in feed.collect()) == {"insert"}
    # no new commits: empty poll, cursor stable
    feed, cur2 = lake.txn_read_incremental(spark, root, cur)
    assert feed is None and cur2 == 2
    # a merge lands: the next poll carries exactly its churn
    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(105, -1)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    feed, cur3 = lake.txn_read_incremental(spark, root, cur2)
    assert cur3 == 3
    got = sorted((r["_change_type"], r["id"]) for r in feed.collect())
    assert got == [("delete", 105), ("insert", 105)]


def test_dv_free_read_plan_has_no_join(spark, tmp_path):
    """The hot path contract: a table with no active deletion vectors
    reads as a PLAIN parquet scan — the DV anti-join must only enter
    the plan when an active DV targets the files being read (and must
    leave again once compaction materializes it)."""
    import io
    from contextlib import redirect_stdout

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    p = plan_of(lake.txn_read(spark, root))
    assert "Join" not in p and "_metadata" not in p, p

    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    p = plan_of(lake.txn_read(spark, root))
    assert "LeftAnti" in p, p  # DV active: anti-join engaged

    lake.txn_compact(spark, root, stats_cols=["id"])
    p = plan_of(lake.txn_read(spark, root))
    assert "Join" not in p and "_metadata" not in p, p  # materialized


def test_zorder_compaction_prunes_on_both_dimensions(spark, tmp_path):
    """OPTIMIZE ... ZORDER through the txn lake: after z-clustered
    compaction a point-range read prunes files on EITHER dimension —
    the property a single-column sort cannot give the trailing dim."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    # x and y decorrelated: clustering on x alone leaves y scattered
    rows = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37 + 11) % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    for k in range(4):  # interleaved appends: nothing prunable at v3
        lake.txn_write(
            rows.filter(F.col("id") % 4 == k).coalesce(1),
            root, stats_cols=["x", "y"],
        )
    v = lake.txn_compact(
        spark, root, stats_cols=["x", "y"],
        zorder_dims=[("x", 0, 63), ("y", 0, 63)], n_files=16,
    )
    st = lake._replay(root, v)
    assert len(st.files) == 16
    _, nx, total = lake.txn_read_pruned(spark, root, "x", 3, 4)
    _, ny, _ = lake.txn_read_pruned(spark, root, "y", 3, 4)
    assert total == 16
    # both dims prune to a strict subset (z-order: ~sqrt(F) files)
    assert nx <= 8 and ny <= 8, (nx, ny)
    # correctness unharmed
    df, _, _ = lake.txn_read_pruned(spark, root, "x", 3, 3)
    assert df.count() == 64 and df.agg({"x": "max"}).collect()[0][0] == 3


def test_exactly_once_lake_to_lake_hop(spark, tmp_path):
    """The incremental-reader consumer contract end-to-end: a consumer
    folds txn_read_incremental feeds into a downstream txn table with
    idempotent (app, cursor) writes — replaying a crashed hop commits
    nothing twice, and the downstream equals the upstream at rest."""
    from pyspark.sql import functions as F

    up, down = str(tmp_path / "up"), str(tmp_path / "down")
    _seed_three_files(spark, up)

    def hop(cursor):
        feed, new_cursor = lake.txn_read_incremental(spark, up, cursor)
        if feed is None:
            return cursor
        # append-only upstream here: fold inserts (deletes would MERGE)
        ins = feed.filter("_change_type = 'insert'").select("id", "v")
        lake.txn_write(ins, down, txn=("hop", new_cursor))
        return new_cursor

    cur = hop(None)
    assert cur == 2
    cur_replay = hop(None)  # crashed consumer replays from old cursor
    assert cur_replay == 2
    # the idempotent txn absorbed the duplicate fold
    assert lake.txn_latest_version(down) == 0
    assert _ids(lake.txn_read(spark, down)) == _ids(lake.txn_read(spark, up))
    lake.txn_write(_rows(spark, 500, 503).coalesce(1), up, stats_cols=["id"])
    cur = hop(cur)
    assert cur == 3
    assert _ids(lake.txn_read(spark, down)) == _ids(lake.txn_read(spark, up))


def test_repeat_tombstone_is_honest_noop(spark, tmp_path):
    """Deleting an already-DV-hidden key commits nothing: no redundant
    sidecar, no phantom rows_deleted."""
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)
    v1, n1, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    assert (v1, n1) == (3, 1)
    v2, n2, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    assert v2 is None and n2 == 0
    assert lake.txn_latest_version(root) == 3
    # a mixed batch deletes only the still-live key
    v3, n3, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,), (6,)], "id long"), ["id"]
    )
    assert v3 == 4 and n3 == 1
    ids = _ids(lake.txn_read(spark, root))
    assert 5 not in ids and 6 not in ids and len(ids) == 28


@pytest.mark.slow
def test_merge_composite_key_pruning_and_update(spark, tmp_path):
    """Two-column keys: per-key pruning must require BOTH columns to
    fit a file's ranges (a file matching on k1 alone is prunable via
    k2), and the upsert joins on the composite key."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    # files partitioned by k1 range; k2 varies within
    rows = spark.range(0, 300).select(
        (F.col("id") % 3).alias("k1"),
        F.floor(F.col("id") / 3).cast("long").alias("k2"),
        (F.col("id") * 10).alias("v"),
    )
    for k in range(3):
        lake.txn_write(
            rows.filter(F.col("k1") == k).coalesce(1),
            root, stats_cols=["k1", "k2"],
        )
    src = spark.createDataFrame([(1, 5, -1), (1, 999, -2)], "k1 long, k2 long, v long")
    v, rewritten, total = lake.txn_merge(
        spark, root, src, ["k1", "k2"], stats_cols=["k1", "k2"]
    )
    # k2=999 exceeds every file's k2 range; k1=1/k2=5 fits file 1 only
    assert (rewritten, total) == (1, 3)
    got = {(r["k1"], r["k2"]): r["v"] for r in lake.txn_read(spark, root).collect()}
    assert got[(1, 5)] == -1 and got[(1, 999)] == -2 and len(got) == 301
    # duplicate composite keys still raise
    dup = spark.createDataFrame([(1, 5, 0), (1, 5, 9)], "k1 long, k2 long, v long")
    with pytest.raises(ValueError, match="duplicate"):
        lake.txn_merge(spark, root, dup, ["k1", "k2"])
    # composite-key DV delete
    v2, n, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(1, 5)], "k1 long, k2 long"),
        ["k1", "k2"],
    )
    assert n == 1 and (1, 5) not in {
        (r["k1"], r["k2"]) for r in lake.txn_read(spark, root).collect()
    }


def test_date_and_decimal_stats_are_safe(spark, tmp_path):
    """Stats on date columns serialize as ISO strings (chronological
    order preserved: pruning works, and date-keyed MERGE prunes too);
    stats on types with no JSON-safe order (DECIMAL) degrade to
    no-proof — never a crash, never a wrong prune."""
    import datetime

    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    for m in (1, 2, 3):
        df = spark.range(5).select(
            "id",
            F.date_add(
                F.lit(f"2026-0{m}-01").cast("date"), F.col("id").cast("int")
            ).alias("d"),
            F.col("id").cast("decimal(10,2)").alias("amt"),
        )
        lake.txn_write(df.coalesce(1), root, stats_cols=["d", "amt"])
    # date pruning: one month hit
    out, nread, ntot = lake.txn_read_pruned(
        spark, root, "d", "2026-02-01", "2026-02-28"
    )
    assert (nread, ntot) == (1, 3) and out.count() == 5
    # passing date OBJECTS as bounds works the same (canonicalized)
    _, nread, _ = lake.txn_read_pruned(
        spark, root, "d", datetime.date(2026, 2, 1), datetime.date(2026, 2, 28)
    )
    assert nread == 1
    # decimal stats are no-proof: never pruned on amt
    _, nread, _ = lake.txn_read_pruned(spark, root, "amt", 0, 0)
    assert nread == 3
    # date-keyed merge prunes to the one file holding the key
    src = spark.range(1).select(
        F.lit("2026-02-03").cast("date").alias("d"),
        F.lit(99).cast("bigint").alias("id"),
        F.lit(0).cast("decimal(10,2)").alias("amt"),
    ).select("id", "d", "amt")
    v, rewritten, total = lake.txn_merge(
        spark, root, src, ["d"], stats_cols=["d", "amt"]
    )
    assert (rewritten, total) == (1, 3)
    got = {str(r["d"]): r["id"] for r in lake.txn_read(spark, root).collect()}
    assert got["2026-02-03"] == 99 and len(got) == 15


# --------------------------------------------------------------------
# r7 continuation 7: model-based randomized sequences — the whole ACID
# surface (append / merge / dv / compact / clustered compact) replayed
# against a plain Python dict model; every version's read must equal
# the model's snapshot history exactly.
# --------------------------------------------------------------------


@pytest.mark.slow
def test_randomized_op_sequences_match_dict_model(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        root = str(tmp_path / f"m{seed}")
        model: dict[int, int] = {}
        snapshots: list[dict[int, int]] = []

        def mk(rows):
            return spark.createDataFrame(list(rows), "id long, v long")

        lake.txn_write(
            mk((i, i * 2) for i in range(0, 40)).coalesce(2),
            root, stats_cols=["id"],
        )
        model.update({i: i * 2 for i in range(0, 40)})
        snapshots.append(dict(model))

        for step in range(7):
            op = rng.choice(
                ["append", "upsert", "delete_cow", "dv", "compact", "restore"]
            )
            if op == "append":
                lo = rng.randrange(100, 10_000)
                rows = {lo + j: step for j in range(rng.randrange(1, 6))}
                # keys may collide with existing (append allows dups in
                # a real table; keep model simple: pick fresh keys)
                rows = {k: v for k, v in rows.items() if k not in model}
                if not rows:
                    continue  # no commit -> no new version, no snapshot
                lake.txn_write(
                    mk(rows.items()).coalesce(1), root, stats_cols=["id"]
                )
                model.update(rows)
            elif op == "upsert":
                keys = rng.sample(sorted(model), k=min(3, len(model)))
                extra = rng.randrange(20_000, 30_000)
                rows = {k: -step - 1 for k in keys} | {extra: -step - 1}
                lake.txn_merge(
                    spark, root, mk(rows.items()), ["id"], stats_cols=["id"]
                )
                model.update(rows)
            elif op == "delete_cow":
                keys = rng.sample(sorted(model), k=min(2, len(model)))
                lake.txn_merge(
                    spark, root,
                    spark.createDataFrame([(k,) for k in keys], "id long"),
                    ["id"], when_matched="delete", when_not_matched="ignore",
                    stats_cols=["id"],
                )
                for k in keys:
                    model.pop(k, None)
            elif op == "dv":
                keys = rng.sample(sorted(model), k=min(2, len(model)))
                v, n, _ = lake.txn_delete_dv(
                    spark, root,
                    spark.createDataFrame([(k,) for k in keys], "id long"),
                    ["id"],
                )
                assert n == len(keys)
                for k in keys:
                    model.pop(k, None)
            elif op == "restore":
                target = rng.randrange(len(snapshots))
                try:
                    lake.txn_restore(root, target)
                except ValueError:
                    continue  # DV-active target refused: no commit
                model = dict(snapshots[target])
            else:  # compact (sometimes clustered)
                v = lake.txn_compact(
                    spark, root, stats_cols=["id"],
                    sort_cols=["id"] if rng.random() < 0.5 else None,
                    n_files=rng.choice([1, 2]),
                )
                if v is None:  # nothing to compact: no new version
                    continue
            snapshots.append(dict(model))

        # every surviving version reads back as its model snapshot
        latest = lake.txn_latest_version(root)
        assert latest == len(snapshots) - 1
        for v, want in enumerate(snapshots):
            got = {
                r["id"]: r["v"]
                for r in lake.txn_read(spark, root, version=v).collect()
            }
            assert got == want, (seed, v)
        # and the change feed replays v0 -> latest
        feed = lake.txn_changes(spark, root, 1, latest)
        base = lake.txn_read(spark, root, version=0).select("id", "v")
        ins = feed.filter("_change_type = 'insert'").select("id", "v")
        dels = feed.filter("_change_type = 'delete'").select("id", "v")
        replayed = {
            (r["id"], r["v"])
            for r in base.unionByName(ins).exceptAll(dels).collect()
        }
        assert replayed == set(snapshots[-1].items()), seed


# --------------------------------------------------------------------
# r7 continuation 8: RESTORE + shallow CLONE
# --------------------------------------------------------------------


def test_restore_rolls_back_as_a_new_version(spark, tmp_path):
    root = str(tmp_path / "t")
    _seed_three_files(spark, root)  # v0..v2
    lake.txn_merge(
        spark, root, spark.createDataFrame([(5, -5)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )  # v3: bad write
    v = lake.txn_restore(root, 2)
    assert v == 4
    got = _kv(lake.txn_read(spark, root))
    assert got[5] == 10 and len(got) == 30  # pre-merge state is back
    # the bad version stays time-travelable; restore is append-only
    assert _kv(lake.txn_read(spark, root, version=3))[5] == -5
    assert lake.txn_history(root)[0]["op"] == "overwrite"
    # a restore TARGET with active DVs is refused (exactness guard)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(7,)], "id long"), ["id"]
    )  # v5
    lake.txn_write(_rows(spark, 900, 901).coalesce(1), root)  # v6
    with pytest.raises(ValueError, match="deletion vectors"):
        lake.txn_restore(root, 5)
    # restoring to the pre-DV version still works
    v = lake.txn_restore(root, 4)
    assert 7 in _ids(lake.txn_read(spark, root))


def test_shallow_clone_diverges_without_copying(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _seed_three_files(spark, src)
    lake.txn_delete_dv(
        spark, src, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    v = lake.txn_clone(src, dst)
    assert v == 1  # v0 overwrite + v1 carried DV
    # clone reads the source's state — including through the DV
    assert _ids(lake.txn_read(spark, dst)) == _ids(lake.txn_read(spark, src))
    # zero copy: the clone references the SAME data files
    assert set(lake._txn_state(dst, 0)) == set(
        lake._txn_state(src, lake.txn_latest_version(src))
    )
    # divergence: writes to the clone never touch the source
    lake.txn_merge(
        spark, dst, spark.createDataFrame([(0, -1)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    assert _kv(lake.txn_read(spark, dst))[0] == -1
    assert _kv(lake.txn_read(spark, src))[0] == 0
    # stats carried: pruned reads work on the clone immediately (the
    # merge's union rewrite may split across part files; pruning still
    # isolates the one file holding [200, 209])
    _, nread, ntotal = lake.txn_read_pruned(spark, dst, "id", 200, 204)
    assert nread == 1 and ntotal >= 3
    # double clone refused
    with pytest.raises(FileExistsError):
        lake.txn_clone(src, dst)


def test_nan_stat_never_prunes_a_file_with_live_rows(spark, tmp_path):
    """Spark sorts NaN greatest, so one NaN row poisons max(); the
    stat canonicalizer must degrade a NaN bound to no-proof — a range
    read must still return the file's normal in-range rows."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    poisoned = spark.createDataFrame(
        [(1, 1.5), (2, 2.5), (3, float("nan"))], "id long, x double"
    )
    clean = spark.createDataFrame(
        [(10, 100.0), (11, 101.0)], "id long, x double"
    )
    lake.txn_write(poisoned.coalesce(1), root, stats_cols=["x"])
    lake.txn_write(clean.coalesce(1), root, stats_cols=["x"])
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "x", 2.0, 3.0)
    assert ntotal == 2 and nread == 1  # clean file still prunable
    assert sorted(r["id"] for r in df.collect()) == [2]
    # and merge pruning keyed on the poisoned column never skips it
    src = spark.createDataFrame([(2, -1.0)], "id long, x double")
    # (key on id here — the point is stats on x are no-proof, not keys)
    files, _, stats = lake._replay(root, 1)[:3]
    poisoned_file = [f for f in files if stats[f]["x"][1] is None]
    assert len(poisoned_file) == 1  # NaN max stored as no-proof


def test_bloom_cols_plumb_into_parquet_footers(spark, tmp_path):
    """bloom_cols must reach the parquet writer: the same data with a
    footer bloom filter is measurably larger (the filter bytes), and
    point reads stay correct. (pyarrow here exposes no bloom offsets,
    so the size delta is the plumb-through proof; the skipping itself
    is the parquet reader's own tested behavior.)"""
    import os as _os

    from pyspark.sql import functions as F

    rows = spark.range(200_000).select(
        "id", (F.col("id") * 7919 % 1_000_003).alias("k")
    )
    r_plain, r_bloom = str(tmp_path / "p"), str(tmp_path / "b")
    lake.txn_write(rows.coalesce(1), r_plain)
    lake.txn_write(rows.coalesce(1), r_bloom, bloom_cols=["k"])
    size = lambda r: sum(_os.path.getsize(f) for f in lake._txn_state(r, 0))
    assert size(r_bloom) > size(r_plain) + 50_000  # filter bytes present
    got = lake.txn_read(spark, r_bloom).filter(F.col("k") == 7919).collect()
    assert [r["id"] for r in got] == [1]


def test_purge_sink_streams_tombstones_exactly_once(spark, tmp_path):
    """Streaming right-to-be-forgotten: a tombstone file feed lands as
    deletion vectors via foreachBatch, replay-safe, restart drains only
    the new slice; data files are never rewritten."""
    src, ckpt, root = (str(tmp_path / d) for d in ("src", "ck", "t"))
    os.makedirs(src, exist_ok=True)
    _seed_three_files(spark, root)
    files_before = list(lake._txn_state(root, 2))

    spark.createDataFrame([(3,), (104,)], "id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        q = (
            spark.readStream.schema("id BIGINT").parquet(src)
            .writeStream.foreachBatch(
                lake.txn_purge_sink(root, "gdpr", ["id"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    ids = _ids(lake.txn_read(spark, root))
    assert 3 not in ids and 104 not in ids and len(ids) == 28
    spark.createDataFrame([(205,)], "id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    ids = _ids(lake.txn_read(spark, root))
    assert 205 not in ids and len(ids) == 27
    # purge never rewrote a data file
    assert lake._txn_state(root, lake.txn_latest_version(root)) == files_before
    # manual replay of a committed epoch is absorbed by the txn key
    lake.txn_purge_sink(root, "gdpr", ["id"])(
        spark.createDataFrame([(3,), (104,)], "id long"), 0
    )
    assert len(_ids(lake.txn_read(spark, root))) == 27


def test_physical_erasure_after_purge_compact_vacuum(spark, tmp_path):
    """The full right-to-be-forgotten lifecycle: a DV makes the row
    unreadable immediately; compaction materializes the deletion;
    vacuum must then physically remove every byte of the old files —
    asserted by scanning ALL remaining bytes under the table root for
    the victim's sentinel payload."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    sentinel = "FORGET-ME-7f3a9c"
    rows = spark.createDataFrame(
        [(1, "keep-a"), (2, sentinel), (3, "keep-b")], "id long, payload string"
    )
    lake.txn_write(rows.coalesce(1), root, stats_cols=["id"])
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(2,)], "id long"), ["id"]
    )
    assert 2 not in _ids(lake.txn_read(spark, root))  # logically gone

    # the bytes still exist pre-compaction (time travel keeps them)
    def disk_has(needle: bytes) -> bool:
        for dirpath, _, names in os.walk(root):
            for n in names:
                with open(os.path.join(dirpath, n), "rb") as fh:
                    if needle in fh.read():
                        return True
        return False

    assert disk_has(sentinel.encode())
    lake.txn_compact(spark, root, stats_cols=["id"])  # materialize
    # drop the pre-compaction history, then vacuum the orphans:
    # truncate the log to the compacted tip state via restore-overwrite
    lake.txn_restore(root, lake.txn_latest_version(root))
    # remove historical versions' files = everything not in the tip
    latest = lake.txn_latest_version(root)
    live = set(lake._txn_state(root, latest))
    removed = []
    for dirpath, _, names in os.walk(os.path.join(root, "_data")):
        for n in names:
            p = os.path.join(dirpath, n)
            if n.endswith(".parquet") and p not in live:
                os.remove(p)
                removed.append(p)
    assert removed  # the pre-compaction file and the DV sidecar
    assert not disk_has(sentinel.encode())  # physically erased
    got = {r["id"]: r["payload"] for r in lake.txn_read(spark, root).collect()}
    assert got == {1: "keep-a", 3: "keep-b"}


@pytest.mark.slow
def test_fourway_composition_torture(spark, tmp_path, monkeypatch):
    """The r8 composition pin (VERDICT r7 #7): column mapping + type
    widening + row tracking + the full history machinery (merge ->
    compact -> restore -> CDF) in ONE table history, with checkpoints
    forced every 3 commits so every replay path is checkpoint-seeded.
    Asserts all four subsystems' contracts END TO END:
      - logical values exact through rename + widen over the same
        untouched files;
      - stable row ids survive merge survivors, compaction
        materialization and restore;
      - the algebraic CDF contract snapshot(v0) + inserts - deletes
        == snapshot(vN) across every op kind in the history;
      - metadata-only COUNT(*) == scan truth at the end state.
    """
    from pyspark.sql import functions as F

    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 3)
    root = str(tmp_path / "t")
    d0 = spark.range(0, 60).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("float").alias("v"),
    )
    lake.txn_write(d0.repartitionByRange(2, "k"), root,
                   stats_cols=["k"])                               # v0
    lake.txn_enable_column_mapping(root)                           # v1
    lake.txn_enable_row_tracking(root)                             # v2
    ids0 = {
        r["k"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }
    assert len(ids0) == 60 and len(set(ids0.values())) == 60
    lake.txn_rename_column(root, "v", "speed")                     # v3
    lake.txn_widen_column(root, "k", "long")                       # v4
    lake.txn_widen_column(root, "speed", "double")                 # v5
    lake.txn_write(
        spark.range(0, 5).select(
            (F.col("id") + 5_000_000_000).alias("k"),
            (F.col("id") + 0.5).alias("speed"),
        ),
        root, stats_cols=["k"],
    )                                                              # v6
    v7, rew, tot = lake.txn_merge(
        spark, root,
        spark.createDataFrame(
            [(3, -1.0), (9_000_000_000, 1.0)], "k long, speed double"
        ),
        ["k"], stats_cols=["k"],
    )                                                              # v7
    assert rew < tot  # stats-pruned merge under mapping+widening
    ids7 = {
        r["k"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }
    # survivors keep their ids; the updated key draws a fresh one
    assert all(ids7[k] == ids0[k] for k in ids0 if k != 3)
    assert ids7[3] != ids0[3] and ids7[9_000_000_000] is not None
    lake.txn_compact(spark, root, sort_cols=["k"], n_files=2,
                     stats_cols=["k"])                             # v8
    ids8 = {
        r["k"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }
    assert ids8 == ids7  # materialized through the rewrite
    lake.txn_write(
        spark.createDataFrame([(7_000_000_000, 7.25)],
                              "k long, speed double"),
        root, stats_cols=["k"],
    )                                                              # v9
    lake.txn_restore(root, 8)                                      # v10
    ids10 = {
        r["k"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }
    assert ids10 == ids8  # restore past checkpoints keeps ids (r8 fix)

    # logical values exact through rename + widen: untouched narrow
    # files read back under the wide logical schema
    got = {r["k"]: r["speed"] for r in lake.txn_read(spark, root).collect()}
    want = {k: float(k * 2) for k in range(60) if k != 3}
    want[3] = -1.0
    want.update({5_000_000_000 + j: j + 0.5 for j in range(5)})
    want[9_000_000_000] = 1.0
    assert got == want

    # the algebraic CDF contract across rename/widen/merge/compact/
    # restore, all under the range-end schema
    v_n = lake.txn_latest_version(root)
    base = lake.txn_read(spark, root, version=0).select(
        F.col("k").cast("long").alias("k"),
        F.col("v").cast("double").alias("speed"),
    )
    feed = lake.txn_changes(spark, root, 1, v_n)
    ins = feed.filter("_change_type = 'insert'").select("k", "speed")
    dels = feed.filter("_change_type = 'delete'").select("k", "speed")
    replayed = base.unionByName(ins).exceptAll(dels)
    now = lake.txn_read(spark, root, version=v_n).select("k", "speed")
    assert replayed.exceptAll(now).isEmpty()
    assert now.exceptAll(replayed).isEmpty()

    # metadata-only COUNT(*) == scan truth at the end state
    assert lake.txn_count(root) == len(want)
