"""Column mapping on the transactional lake (the Delta "name"-mode
shape): every column owns a STABLE physical name recorded as
``cm_phys`` field metadata in the commit schema; data files are
written under physical names and reads rename physical -> logical.
RENAME and DROP COLUMN are therefore metadata-only commits — zero
data rewritten at any table size — and a column re-added after a drop
receives a fresh physical name, so dropped data can never resurrect
through old parquet footers. Mapped logs stamp protocol CM_PROTOCOL
so a reader that cannot rename refuses loudly.

Reference parity note: the reference schema is fixed CQL DDL
(src/sql/collab_filter_setup.sql); column mapping is parity-plus for
the lake layer, mirroring Delta's ALTER TABLE RENAME/DROP COLUMN.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_cassandra_collabfiltering_spark.sources import lake


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("d"), F.col("id")).alias("name"),
        (F.col("id") * 10).cast("int").alias("score"),
    )


def _mapped(spark, tmp_path, name="t"):
    """A small mapped table: 10 rows, id stats, score renamed to
    points at v2."""
    root = str(tmp_path / name)
    lake.txn_write(
        _rows(spark, 0, 10).repartitionByRange(2, "id"), root,
        stats_cols=["id"],
    )
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "score", "points")
    return root


# ---------------------------------------------------------------- DDL


def test_enable_is_metadata_only_and_idempotent(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 5), root)
    files_before = sorted(lake._replay(root, 0).files)
    v = lake.txn_enable_column_mapping(root)
    assert v == 1
    # physical names adopt the current logical names (Delta upgrade
    # semantics) — files already on disk stay valid unread
    assert lake.txn_column_mapping(root) == {
        "id": "id", "name": "name", "score": "score"
    }
    assert sorted(lake._replay(root, v).files) == files_before
    assert lake._read_commit(root, v)["op"] == "meta"
    # idempotent: enabling twice returns the same version, no commit
    assert lake.txn_enable_column_mapping(root) == v
    assert lake.txn_latest_version(root) == v


def test_rename_is_metadata_only_and_values_survive(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 10), root)
    lake.txn_enable_column_mapping(root)
    n_data = len(lake._replay(root, 1).files)
    v = lake.txn_rename_column(root, "score", "points")
    assert lake._read_commit(root, v)["files"] == []  # zero data moved
    assert len(lake._replay(root, v).files) == n_data
    got = lake.txn_read(spark, root)
    assert got.columns == ["id", "name", "points"]
    assert got.agg(F.sum("points")).collect()[0][0] == 450
    # the physical name is unchanged — rename is pure metadata
    assert lake.txn_column_mapping(root)["points"] == "score"


def test_rename_requires_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 3), root)
    with pytest.raises(ValueError, match="column mapping is not enabled"):
        lake.txn_rename_column(root, "score", "points")
    with pytest.raises(ValueError, match="column mapping is not enabled"):
        lake.txn_drop_column(root, "score")


def test_rename_validates_names(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    with pytest.raises(ValueError, match="no column"):
        lake.txn_rename_column(root, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        lake.txn_rename_column(root, "points", "name")


def test_constrained_column_refuses_rename_and_drop(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    lake.txn_set_constraint(root, "pts_nonneg", "points >= 0")
    with pytest.raises(ValueError, match="constraint"):
        lake.txn_rename_column(root, "points", "pts")
    with pytest.raises(ValueError, match="constraint"):
        lake.txn_drop_column(root, "points")
    # dropping the constraint unblocks the DDL
    lake.txn_drop_constraint(root, "pts_nonneg")
    lake.txn_rename_column(root, "points", "pts")
    assert "pts" in lake.txn_read(spark, root).columns


def test_drop_refuses_partition_and_last_column(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _rows(spark, 0, 6).withColumn("part", F.col("id") % 2), root,
        partition_by=["part"],
    )
    lake.txn_enable_column_mapping(root)
    with pytest.raises(ValueError, match="partition column"):
        lake.txn_drop_column(root, "part")
    root2 = str(tmp_path / "u")
    lake.txn_write(spark.range(3).select("id"), root2)
    lake.txn_enable_column_mapping(root2)
    with pytest.raises(ValueError, match="last column"):
        lake.txn_drop_column(root2, "id")


# ------------------------------------------------------- write paths


def test_append_after_rename_lands_under_physical_name(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    v = lake.txn_write(
        spark.createDataFrame(
            [(100, "x", 999)], "id int, name string, points int"
        ),
        root,
        stats_cols=["id"],
    )
    # the new file physically carries the ORIGINAL column name — the
    # mapping, not the data, holds the logical name
    newf = lake._read_commit(root, v)["files"]
    raw = spark.read.parquet(*newf)
    assert "score" in raw.columns and "points" not in raw.columns
    got = lake.txn_read(spark, root)
    assert got.filter("id = 100").collect()[0]["points"] == 999
    # and the stats key is physical too, yet pruning speaks logical:
    st = lake._read_commit(root, v)["stats"]
    assert all("id" in s for s in st.values())


def test_old_logical_name_is_refused_after_rename(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    with pytest.raises(lake.SchemaMismatch):
        lake.txn_write(
            spark.createDataFrame(
                [(100, "x", 1)], "id int, name string, score int"
            ),
            root,
        )


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    lake.txn_drop_column(root, "points")
    assert lake.txn_read(spark, root).columns == ["id", "name"]
    # re-add the same LOGICAL name: fresh physical name, so the ten
    # old rows' points values stay invisible forever
    lake.txn_write(
        spark.createDataFrame(
            [(200, "y", 5)], "id int, name string, points int"
        ),
        root,
        merge_schema=True,
    )
    vals = {
        r["id"]: r["points"] for r in lake.txn_read(spark, root).collect()
    }
    assert vals[200] == 5
    assert all(vals[i] is None for i in range(10))
    phys = lake.txn_column_mapping(root)["points"]
    assert phys.startswith("col-") and phys != "score"


def test_time_travel_shows_each_versions_vocabulary(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    assert lake.txn_read(spark, root, version=0).columns == [
        "id", "name", "score"
    ]
    assert lake.txn_read(spark, root).columns == ["id", "name", "points"]


def test_rename_does_not_trigger_merge_schema(spark, tmp_path):
    # the read-side mergeSchema decision compares PHYSICAL projections:
    # a rename changes no file bytes, so the physical schema identity
    # is unchanged and the scan must stay a first-footer read
    root = _mapped(spark, tmp_path)
    latest = lake.txn_latest_version(root)
    tj = lake._table_schema_json(root, latest)
    st = lake._replay(root, latest)
    assert {
        lake._cm_physical_json(s) for s in st.file_schemas.values()
    } == {lake._cm_physical_json(tj)}


# ------------------------------------------- pruning / merge / DV


def test_pruned_read_translates_logical_to_physical_stats(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    lake.txn_rename_column(root, "id", "doc_id")  # rename the STATS col
    df, nread, ntotal = lake.txn_read_pruned(spark, root, "doc_id", 0, 4)
    assert nread < ntotal  # still prunes from pre-rename stats
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 1, 2, 3, 4]


def test_merge_on_renamed_key_prunes_and_updates(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    src = spark.createDataFrame(
        [(0, "zz", 7), (300, "new", 8)], "id int, name string, points int"
    )
    v, rewrote, total = lake.txn_merge(
        spark, root, src, ["id"], stats_cols=["id"]
    )
    assert rewrote < total  # per-key pruning through physical stats
    vals = {
        r["id"]: (r["name"], r["points"])
        for r in lake.txn_read(spark, root).collect()
    }
    assert vals[0] == ("zz", 7) and vals[300] == ("new", 8)
    assert vals[5] == ("d5", 50)  # untouched row intact


def test_dv_delete_on_mapped_table(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    v, n_del, n_cand = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(3,)], "id int"), ["id"]
    )
    assert n_del == 1 and n_cand < len(lake._replay(root, v).files)
    assert 3 not in {r["id"] for r in lake.txn_read(spark, root).collect()}


def test_compact_materializes_dropped_column_away(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    lake.txn_drop_column(root, "points")
    v = lake.txn_compact(spark, root, stats_cols=["id"], sort_cols=["id"])
    newf = lake._read_commit(root, v)["files"]
    raw = spark.read.parquet(*newf)
    # the rewrite reads LOGICAL rows, so the dropped physical column
    # is gone from the compacted files (storage reclaimed)
    assert set(raw.columns) == {"id", "name"}
    assert lake.txn_read(spark, root).count() == 10


def test_partitioned_table_rename_of_partition_column(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _rows(spark, 0, 8).withColumn("part", (F.col("id") % 2).cast("int")),
        root,
        partition_by=["part"],
        stats_cols=["id"],
    )
    lake.txn_enable_column_mapping(root)
    # renaming a partition column is metadata-only: the layout is
    # keyed by PHYSICAL name, hive dirs on disk keep saying part=...
    v = lake.txn_rename_column(root, "part", "bucket")
    assert lake._read_commit(root, v)["files"] == []
    got = lake.txn_read(spark, root)
    assert "bucket" in got.columns
    df, nread, ntotal = lake.txn_read_partitioned(spark, root, {"bucket": 1})
    assert nread < ntotal
    assert {r["bucket"] for r in df.collect()} == {1}
    assert sorted(r["id"] for r in df.collect()) == [1, 3, 5, 7]
    # appends inherit the spec; compaction preserves it; both stay
    # readable under the new logical name
    lake.txn_write(
        spark.createDataFrame(
            [(100, "x", 1, 1)], "id int, name string, score int, bucket int"
        ),
        root,
    )
    lake.txn_compact(spark, root, sort_cols=["id"], stats_cols=["id"])
    df2, nread2, _ = lake.txn_read_partitioned(spark, root, {"bucket": 1})
    assert sorted(r["id"] for r in df2.collect()) == [1, 3, 5, 7, 100]
    with pytest.raises(ValueError, match="not partition columns"):
        lake.txn_read_partitioned(spark, root, {"part": 1})


# ----------------------------------------------------- CDF / restore


def test_cdf_across_rename_uses_range_end_vocabulary(spark, tmp_path):
    root = _mapped(spark, tmp_path)  # v0 write, v1 enable, v2 rename
    lake.txn_write(
        spark.createDataFrame(
            [(100, "x", 999)], "id int, name string, points int"
        ),
        root,
    )  # v3
    ch = lake.txn_changes(spark, root, 0)
    assert ch.columns[:3] == ["id", "name", "points"]
    # pre-rename inserts carry their VALUES under the new name — the
    # physical column is stable, so nothing NULLs out across a rename
    v0_inserts = ch.filter("_commit_version = 0")
    assert v0_inserts.count() == 10
    assert v0_inserts.agg(F.sum("points")).collect()[0][0] == 450
    # the enable/rename meta commits emit no row churn
    assert ch.filter("_commit_version in (1, 2)").count() == 0
    # algebraic replay: v0 snapshot + inserts - deletes == snapshot now
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(4,)], "id int"), ["id"]
    )
    ch = lake.txn_changes(spark, root, 1)  # post-v0 churn
    base = lake.txn_read(spark, root, version=0).withColumnRenamed(
        "score", "points"
    )
    ins = ch.filter("_change_type = 'insert'").drop(
        "_change_type", "_commit_version"
    )
    dele = ch.filter("_change_type = 'delete'").drop(
        "_change_type", "_commit_version"
    )
    replayed = base.unionByName(ins).exceptAll(dele)
    now = lake.txn_read(spark, root)
    assert replayed.exceptAll(now).isEmpty()
    assert now.exceptAll(replayed).isEmpty()


def test_restore_to_pre_enable_version_keeps_mapping(spark, tmp_path):
    # r8 contract change (the r7 ROADMAP corner): restoring BELOW the
    # mapping enable must NOT downgrade the table protocol — a reader
    # that replayed the mapped middle commits would misproject, and
    # CDF under the range-end schema would NULL-fill the mapped
    # history. The restored files carry logical-as-physical names, so
    # the restore stamps enable-time physical names: same data, same
    # logical columns, protocol stays 2.
    root = _mapped(spark, tmp_path)
    v = lake.txn_restore(root, 0)
    assert lake.txn_column_mapping(root) == {
        "id": "id", "name": "name", "score": "score"
    }
    assert lake.txn_read(spark, root).columns == ["id", "name", "score"]
    assert lake._read_commit(root, v)["protocol"] == lake.CM_PROTOCOL


def test_clone_carries_mapping_and_protocol(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    dst = str(tmp_path / "c")
    lake.txn_clone(root, dst)
    assert lake.txn_column_mapping(dst) == lake.txn_column_mapping(root)
    assert lake._read_commit(dst, 0)["protocol"] == lake.CM_PROTOCOL
    assert lake.txn_read(spark, dst).columns == ["id", "name", "points"]


# ------------------------------------------------ protocol / readers


def test_mapped_commits_stamp_cm_protocol(spark, tmp_path):
    root = _mapped(spark, tmp_path)
    assert lake._read_commit(root, 0)["protocol"] == lake.PROTOCOL_VERSION
    for v in (1, 2):
        assert lake._read_commit(root, v)["protocol"] == lake.CM_PROTOCOL
    v = lake.txn_write(
        spark.createDataFrame(
            [(100, "x", 1)], "id int, name string, points int"
        ),
        root,
    )
    assert lake._read_commit(root, v)["protocol"] == lake.CM_PROTOCOL
    assert lake.txn_detail(root)["protocol"] == lake.CM_PROTOCOL
    assert lake.txn_detail(root)["column_mapping"]["points"] == "score"


def test_pre_mapping_reader_refuses_mapped_log(spark, tmp_path, monkeypatch):
    # a reader that does not know the rename step must refuse the log
    # rather than surface physical column names
    root = _mapped(spark, tmp_path)
    monkeypatch.setattr(lake, "MAX_READER_PROTOCOL", 1)
    with pytest.raises(lake.UnsupportedProtocol, match="protocol"):
        lake.txn_read(spark, root)
    monkeypatch.undo()
    assert lake.txn_read(spark, root).count() == 10


@pytest.mark.slow
def test_data_source_reads_and_writes_mapped_tables(spark, tmp_path):
    # format("txnlake") handles column mapping natively: the schema's
    # cm_phys metadata drives the physical->logical rename executor-
    # side; pushed filters translate to physical stats keys; the Arrow
    # writer lands task batches under the physical names
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeDataSource,
        TxnLakePushdownReader,
    )

    spark.dataSource.register(TxnLakeDataSource)
    root = _mapped(spark, tmp_path)
    got = spark.read.format("txnlake").option("root", root).load()
    assert got.columns == ["id", "name", "points"]
    assert got.agg(F.sum("points")).collect()[0][0] == 450
    # DS write: logical batches land under the stable PHYSICAL names
    spark.createDataFrame(
        [(100, "x", 999)], "id int, name string, points int"
    ).write.format("txnlake").option("root", root).option(
        "stats_cols", "id"
    ).mode("append").save()
    v = lake.txn_latest_version(root)
    newf = lake._read_commit(root, v)["files"]
    raw = spark.read.parquet(*newf)
    assert "score" in raw.columns and "points" not in raw.columns
    got = spark.read.format("txnlake").option("root", root).load()
    assert got.filter("id = 100").collect()[0]["points"] == 999
    # pushed filters prune through the physically-keyed stats even
    # after the stats column itself is renamed
    lake.txn_rename_column(root, "id", "doc_id")
    r = TxnLakePushdownReader(root, None)
    r.pushFilters(
        [GreaterThanOrEqual(("doc_id",), 0), LessThanOrEqual(("doc_id",), 4)]
    )
    assert len(r.partitions()) < len(
        lake._replay(root, lake.txn_latest_version(root)).files
    )


def test_stream_source_skips_meta_commits_and_renames(spark, tmp_path):
    # enable/rename/constraint commits change no rows: the streaming
    # source emits nothing for them instead of tripping the
    # append-only contract, and a mapped table streams under its
    # LOGICAL names
    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeDataSource,
    )

    spark.dataSource.register(TxnLakeDataSource)
    root = _mapped(spark, tmp_path)  # history contains 2 meta commits
    q = (
        spark.readStream.format("txnlake").option("root", root).load()
        .writeStream.format("memory").queryName("cm_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select count(*) c, sum(points) s from cm_stream"
    ).collect()[0]
    assert (got["c"], got["s"]) == (10, 450)


# -------------------------------------------------------- concurrency


def test_rename_rebases_past_concurrent_append(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 5), root)
    lake.txn_enable_column_mapping(root)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_write(_rows(spark, 50, 52), root)
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        v = lake.txn_rename_column(root, "score", "points")
    finally:
        os.open = real_open
    assert v == 3  # rebased past the append
    got = lake.txn_read(spark, root)
    assert got.columns == ["id", "name", "points"]
    assert got.count() == 7  # both the append and the rename survived


def test_append_conflicts_with_concurrent_drop_readd(spark, tmp_path):
    # the race the write-mapping guard exists for: an evolving append
    # whose column is dropped AND re-added (fresh physical name) in
    # the commit gap must conflict, not silently land NULLs
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 5).drop("score"), root)
    lake.txn_enable_column_mapping(root)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen["done"]:
            stolen["done"] = True
            # gap: someone else evolves the same column name first
            lake.txn_write(
                spark.createDataFrame(
                    [(90, "w", 1.5)], "id int, name string, extra double"
                ),
                root,
                merge_schema=True,
            )
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        with pytest.raises(lake.ConcurrentWriteConflict, match="remapped"):
            lake.txn_write(
                spark.createDataFrame(
                    [(91, "v", 2.5)], "id int, name string, extra double"
                ),
                root,
                merge_schema=True,
            )
    finally:
        os.open = real_open
    # the winner's data is intact; the loser landed nothing
    got = lake.txn_read(spark, root)
    assert {r["id"] for r in got.collect()} == {0, 1, 2, 3, 4, 90}


def test_concurrent_renames_conflict_on_same_column(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 5), root)
    lake.txn_enable_column_mapping(root)

    real_open = os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_rename_column(root, "score", "pts")
        return real_open(path, flags, *a, **k)

    os.open = stealing_open
    try:
        # rebase re-applies the edit at the tip: 'score' is gone there
        with pytest.raises(ValueError, match="no column"):
            lake.txn_rename_column(root, "score", "points")
    finally:
        os.open = real_open
    assert lake.txn_read(spark, root).columns == ["id", "name", "pts"]


def test_checkpoint_roundtrips_mapping(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    lake.txn_write(_rows(spark, 0, 5), root)
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "score", "points")
    for i in range(3):
        lake.txn_write(
            spark.createDataFrame(
                [(100 + i, "x", i)], "id int, name string, points int"
            ),
            root,
        )
    assert os.path.exists(lake._checkpoint_path(root, 4))
    got = lake.txn_read(spark, root)
    assert got.columns == ["id", "name", "points"]
    assert got.count() == 8
