"""Row tracking on the transactional lake (the Delta row-tracking
shape): every row owns a STABLE 64-bit ``_row_id``. Fresh rows derive
ids lazily at read time (file's commit-reserved base + row position —
appends pay nothing extra), rewrites carry ids as a materialized
``__row_id`` column, the base allocator recomputes per rebase attempt
so racing appends never overlap ranges, and ids are never reused."""

import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import lake


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _ids(spark, root):
    return {
        r["id"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }


def _tracked(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _d(spark, 0, 100).repartitionByRange(2, "id"), root,
        stats_cols=["id"],
    )
    lake.txn_enable_row_tracking(root)
    return root


def test_enable_backfills_and_is_idempotent(spark, tmp_path):
    root = _tracked(spark, tmp_path)
    v = lake.txn_latest_version(root)
    assert lake._read_commit(root, v)["op"] == "meta"
    assert lake.txn_enable_row_tracking(root) == v  # idempotent
    ids = _ids(spark, root)
    assert len(set(ids.values())) == 100
    assert sorted(ids.values()) == list(range(100))
    assert lake.txn_detail(root)["row_tracking"] is True


def test_appends_draw_fresh_ids_and_old_ids_are_stable(spark, tmp_path):
    root = _tracked(spark, tmp_path)
    before = _ids(spark, root)
    lake.txn_write(_d(spark, 500, 510), root)
    after = _ids(spark, root)
    assert all(after[k] == before[k] for k in before)
    fresh = {after[k] for k in range(500, 510)}
    assert len(fresh) == 10 and fresh.isdisjoint(set(before.values()))


def test_compact_materializes_and_preserves_ids(spark, tmp_path):
    root = _tracked(spark, tmp_path)
    before = _ids(spark, root)
    v = lake.txn_compact(spark, root, sort_cols=["id"], stats_cols=["id"])
    assert _ids(spark, root) == before
    # physically materialized in the rewritten files
    raw = spark.read.parquet(*lake._read_commit(root, v)["files"])
    assert lake.ROW_ID_COL in raw.columns
    # ...and invisible to a plain read
    assert lake.ROW_ID_COL not in lake.txn_read(spark, root).columns
    # a SECOND rewrite cycle still preserves (materialized wins)
    lake.txn_compact(spark, root, n_files=2, stats_cols=["id"])
    assert _ids(spark, root) == before


def test_merge_survivors_keep_ids_updates_and_inserts_get_fresh(
    spark, tmp_path
):
    root = _tracked(spark, tmp_path)
    before = _ids(spark, root)
    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(0, 999), (9000, 1)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    after = _ids(spark, root)
    assert all(after[k] == before[k] for k in set(before) - {0})
    assert after[0] != before[0]  # the update is a NEW row version
    assert after[9000] not in set(before.values())
    assert len(set(after.values())) == len(after)  # globally unique


def test_dv_delete_drops_ids_with_rows(spark, tmp_path):
    root = _tracked(spark, tmp_path)
    before = _ids(spark, root)
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    after = _ids(spark, root)
    assert 5 not in after
    assert all(after[k] == before[k] for k in after)


def test_racing_appends_never_overlap_id_ranges(spark, tmp_path):
    root = _tracked(spark, tmp_path)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_write(_d(spark, 600, 650), root)  # the winner
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        lake.txn_write(_d(spark, 700, 760), root)  # rebases, realloc
    finally:
        os.open = real_open
    ids = _ids(spark, root)
    assert len(ids) == 210
    assert len(set(ids.values())) == 210  # no overlap after the race


def test_reserved_name_and_not_enabled_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 5), root)
    with pytest.raises(ValueError, match="row tracking is not enabled"):
        lake.txn_read_with_ids(spark, root)
    bad = _d(spark, 0, 3).withColumn(lake.ROW_ID_COL, F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        lake.txn_write(bad, root)
    with pytest.raises(ValueError, match="reserved"):
        lake.txn_merge(spark, root, bad, ["id"])


def test_compose_with_partitions_and_column_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _d(spark, 0, 40).withColumn("p", (F.col("id") % 2).cast("int")),
        root,
        partition_by=["p"], stats_cols=["id"],
    )
    lake.txn_enable_row_tracking(root)
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "v", "value")
    before = _ids(spark, root)
    assert len(set(before.values())) == 40
    lake.txn_write(
        spark.createDataFrame(
            [(500, 7, 1)], "id long, value long, p int"
        ),
        root,
    )
    lake.txn_compact(spark, root, sort_cols=["id"], stats_cols=["id"])
    after = _ids(spark, root)
    assert all(after[k] == before[k] for k in before)
    assert len(set(after.values())) == 41
    got = lake.txn_read_with_ids(spark, root)
    assert set(got.columns) == {"id", "value", "p", "_row_id"}


def test_clone_and_checkpoint_carry_row_tracking(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 2)
    root = _tracked(spark, tmp_path)
    before = _ids(spark, root)
    for lo in (200, 210, 220):
        lake.txn_write(_d(spark, lo, lo + 5), root)
    assert os.path.exists(lake._checkpoint_path(root, 2))
    after = _ids(spark, root)
    assert all(after[k] == before[k] for k in before)
    assert len(set(after.values())) == 115
    dst = str(tmp_path / "c")
    lake.txn_clone(root, dst)
    assert _ids(spark, dst) == after
    # the clone keeps allocating ABOVE the carried high-water mark
    lake.txn_write(_d(spark, 900, 905), dst)
    cids = _ids(spark, dst)
    assert len(set(cids.values())) == 120
