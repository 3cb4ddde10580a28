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
