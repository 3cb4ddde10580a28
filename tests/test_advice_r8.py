"""Regression pins for the round-8 ADVICE findings (ADVICE.md r7).

1. (high) TxnLakeWriter renamed task batches with the PRE-commit
   mapping: an overwrite adding a column to a mapped table wrote the
   new column under its logical name while the committed schema said
   ``cm_phys=col-<uuid>`` — every later read projected the missing
   physical name as typed NULL (silent data loss). The DS writer also
   had no guard against a concurrent rename landing between writer
   init and commit (txn_write pins the write mapping via wm_cell and
   raises ConcurrentWriteConflict; the DS writer must too).
2. (medium) txn_vacuum_retain kept boundary pre-images via
   c['removes']/c['dv_for'], but an OVERWRITE records no removes —
   its pre-image is the v-1 live file set, so a horizon placed
   exactly on an overwrite broke txn_changes(horizon, ...).
3. (medium) txn_restore re-embedded stats/partition values but not
   row_bases: restoring past an intervening checkpoint left the
   restored fresh-id files baseless, so txn_read_with_ids returned
   NULL _row_id for every row in them.
4. (low) compact/merge commits that materialize the internal
   __row_id column into data files did not bump the commit protocol,
   so a protocol-1 reader's plain first-footer scan would surface
   __row_id as a user column instead of refusing loudly.
5. (low) _row_alloc reserved a ZERO-length id range for a file whose
   footer row count was unavailable at stats time, so the next
   file's base overlapped it and derived ids collided across files.
"""

import json
import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import lake
from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
    TxnLakeDataSource,
    TxnLakeWriter,
)


@pytest.fixture(scope="module")
def dspark(spark):
    spark.dataSource.register(TxnLakeDataSource)
    return spark


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


# --------------------------------------------------------------------
# 1 (high): DS overwrite that ADDS a column to a mapped table
# --------------------------------------------------------------------


def test_ds_overwrite_added_column_to_mapped_table_reads_back(
    dspark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(dspark, 0, 50).coalesce(1), root)
    lake.txn_enable_column_mapping(root)
    wide = _d(dspark, 0, 50).withColumn("w", F.col("id") + 100)
    wide.coalesce(1).write.format("txnlake").option("root", root).mode(
        "overwrite"
    ).save()
    got = lake.txn_read(dspark, root)
    rows = {r["id"]: r["w"] for r in got.collect()}
    # pre-fix: the committed schema assigned a fresh physical name the
    # files never carried, so every w surfaced as NULL
    assert rows == {i: i + 100 for i in range(50)}
    # the committed mapping must cover the new column with the name
    # the files actually carry
    tj = lake._table_schema_json(root, lake.txn_latest_version(root))
    m = lake._cm_mapping(tj)
    assert set(m) == {"id", "v", "w"}


def _task_messages(writer, schema_names, rows):
    """Run the writer's task side by hand (one Arrow batch)."""
    cols = list(zip(*rows)) if rows else [[] for _ in schema_names]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(list(c), type=pa.int64()) for c in cols],
        names=list(schema_names),
    )
    return [writer.write(iter([batch]))]


def test_ds_writer_detects_concurrent_rename_between_init_and_commit(
    dspark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(dspark, 0, 10).coalesce(1), root)
    lake.txn_enable_column_mapping(root)
    schema = lake.txn_read(dspark, root).schema
    w = TxnLakeWriter(root, schema, overwrite=True, stats_cols=[])
    msgs = _task_messages(w, ["id", "v"], [(i, i * 2) for i in range(10)])
    # a rename lands in the init -> commit window: the files were
    # written under the OLD physical names for the OLD logical names
    lake.txn_rename_column(root, "v", "speed")
    with pytest.raises(lake.ConcurrentWriteConflict):
        w.commit(msgs)


def test_ds_append_detects_concurrent_drop_readd_remap(dspark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(dspark, 0, 10).coalesce(1), root)
    lake.txn_enable_column_mapping(root)
    schema = lake.txn_read(dspark, root).schema
    w = TxnLakeWriter(root, schema, overwrite=False, stats_cols=[])
    msgs = _task_messages(w, ["id", "v"], [(i, i * 2) for i in range(10, 20)])
    # drop + re-add of v: same logical name, FRESH physical name; the
    # already-written files carry the dead physical column
    lake.txn_drop_column(root, "v")
    lake.txn_write(_d(dspark, 90, 91).coalesce(1), root, merge_schema=True)
    with pytest.raises(lake.ConcurrentWriteConflict):
        w.commit(msgs)


# --------------------------------------------------------------------
# 2 (medium): vacuum horizon placed exactly on an OVERWRITE
# --------------------------------------------------------------------


def test_vacuum_horizon_on_overwrite_keeps_cdf_preimage(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 100).coalesce(2), root)          # v0
    lake.txn_write(_d(spark, 500, 550).coalesce(1), root,
                   mode="overwrite")                              # v1
    lake.txn_write(_d(spark, 900, 910).coalesce(1), root)        # v2
    lake.txn_vacuum_retain(root, 1)  # horizon EXACTLY on the overwrite
    ch = lake.txn_changes(spark, root, 1, 2)
    dels = ch.filter(
        (F.col("_change_type") == "delete") & (F.col("_commit_version") == 1)
    )
    # pre-fix: v0's files were reclaimed and this scan crashed
    assert sorted(r["id"] for r in dels.collect()) == list(range(100))


def test_vacuum_horizon_on_overwrite_keeps_prior_dv_sidecars(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 100).coalesce(2), root,
                   stats_cols=["id"])                             # v0
    lake.txn_delete_dv(spark, root,
                       spark.range(0, 10).select("id"), ["id"])   # v1 dv
    lake.txn_write(_d(spark, 500, 550).coalesce(1), root,
                   mode="overwrite")                              # v2
    lake.txn_write(_d(spark, 900, 910).coalesce(1), root)        # v3
    lake.txn_vacuum_retain(root, 2)
    ch = lake.txn_changes(spark, root, 2, 2)
    dels = ch.filter(F.col("_change_type") == "delete")
    # the overwrite's pre-image is the DV-FILTERED v1 state
    assert sorted(r["id"] for r in dels.collect()) == list(range(10, 100))


# --------------------------------------------------------------------
# 3 (medium): restore past an intervening checkpoint loses row bases
# --------------------------------------------------------------------


def test_restore_after_checkpoint_keeps_stable_row_ids(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 1)
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 40).coalesce(2), root)            # v0
    lake.txn_enable_row_tracking(root)                            # v1
    before = {
        r["id"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }
    assert all(v is not None for v in before.values())
    lake.txn_write(_d(spark, 700, 710).coalesce(1), root,
                   mode="overwrite")                              # v2
    lake.txn_write(_d(spark, 800, 810).coalesce(1), root)         # v3
    # checkpoints landed at every version; v0's files are dead in all
    # of them, so their row_bases are gone from checkpointed state
    lake.txn_restore(root, 1)                                     # v4
    after = {
        r["id"]: r["_row_id"]
        for r in lake.txn_read_with_ids(spark, root).collect()
    }
    # pre-fix: every restored row came back with NULL _row_id
    assert after == before


def test_restore_pre_tracking_version_allocates_fresh_ids(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 30).coalesce(1), root)            # v0
    lake.txn_write(_d(spark, 100, 130).coalesce(1), root,
                   mode="overwrite")                              # v1
    lake.txn_enable_row_tracking(root)                            # v2
    hwm = lake._replay(root, 2).row_hwm
    lake.txn_restore(root, 0)                                     # v3
    got = lake.txn_read_with_ids(spark, root)
    ids = [r["_row_id"] for r in got.collect()]
    assert len(ids) == 30 and len(set(ids)) == 30
    assert all(i is not None and i >= hwm for i in ids)  # never reused


# --------------------------------------------------------------------
# 4 (low): materialized __row_id bumps the commit protocol
# --------------------------------------------------------------------


def test_rowid_materializing_commits_stamp_protocol_2(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 40).coalesce(2), root)            # v0
    lake.txn_enable_row_tracking(root)                            # v1
    v = lake.txn_compact(spark, root)  # materializes __row_id
    c = lake._read_commit(root, v)
    assert c.get("protocol", 1) >= lake.ROWID_PROTOCOL
    # a plain untracked table keeps writing protocol 1
    root2 = str(tmp_path / "u")
    lake.txn_write(_d(spark, 0, 10).coalesce(2), root2)
    v2 = lake.txn_compact(spark, root2)
    assert lake._read_commit(root2, v2).get("protocol", 1) == 1


def test_checkpoints_carry_protocol_for_old_readers(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 40).coalesce(2), root)            # v0
    lake.txn_enable_row_tracking(root)                            # v1
    lake.txn_compact(spark, root)                                 # v2
    lake.txn_write(_d(spark, 50, 60).coalesce(1), root)           # v3
    lake.txn_write(_d(spark, 60, 70).coalesce(1), root)           # v4
    cp = lake._latest_checkpoint(root, 4)
    assert cp is not None and cp.get("protocol", 1) >= 2
    # a reader capped below the checkpoint protocol must refuse, not
    # silently replay state written under rules it does not know
    monkeypatch.setattr(lake, "MAX_READER_PROTOCOL", 1)
    with pytest.raises(lake.UnsupportedProtocol):
        lake.txn_read(spark, root)


# --------------------------------------------------------------------
# 5 (low): row-id allocation must never reserve a zero-length range
# --------------------------------------------------------------------


def test_row_alloc_falls_back_to_footer_on_missing_counts(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)            # v0
    lake.txn_enable_row_tracking(root)                            # v1
    # simulate footer reads failing at STATS time (absent _NROWS_KEY)
    monkeypatch.setattr(lake, "_file_row_counts", lambda files: {})
    lake.txn_write(_d(spark, 100, 140).repartitionByRange(2, "id"), root)
    monkeypatch.undo()
    got = lake.txn_read_with_ids(spark, root)
    ids = [r["_row_id"] for r in got.collect()]
    # pre-fix: both new files reserved base=hwm with length 0, so the
    # two files' derived ids collided pairwise
    assert len(ids) == 50 and len(set(ids)) == 50


def test_row_alloc_refuses_genuinely_uncountable_file(tmp_path):
    # the file cannot be footer-read and must fail the commit, never
    # reserve an overlapping zero-length range
    with pytest.raises(RuntimeError, match="row count"):
        lake._row_alloc_ranges(["/nonexistent/x.parquet"], {}, 7)


# --------------------------------------------------------------------
# r8 extra: restore to a pre-mapping version must not downgrade the
# table protocol (the r7 ROADMAP corner — CDF under the range-end
# schema NULL-filled the mapped history)
# --------------------------------------------------------------------


def test_restore_below_mapping_enable_keeps_protocol_and_cdf(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 40).coalesce(1), root)            # v0
    lake.txn_enable_column_mapping(root)                          # v1
    lake.txn_rename_column(root, "v", "speed")                    # v2
    lake.txn_write(
        spark.range(40, 50).select(
            "id", (F.col("id") * 2).alias("speed")
        ),
        root,
    )                                                             # v3
    lake.txn_restore(root, 0)                                     # v4
    # the restore commit keeps the table mapped (protocol 2): the
    # restored files carry logical-as-physical names, stamped as such
    v4 = lake.txn_latest_version(root)
    assert lake._read_commit(root, v4).get("protocol", 1) == 2
    m = lake._cm_mapping(lake._table_schema_json(root, v4))
    assert m == {"id": "id", "v": "v"}
    got = lake.txn_read(spark, root)
    assert set(got.columns) == {"id", "v"}
    assert sorted(r["id"] for r in got.collect()) == list(range(40))
    # the CDF replay contract holds ACROSS the restore: the range-end
    # schema is v0's vocabulary, so the mapped middle history aligns
    # through stable physical names instead of NULL-filling
    base = lake.txn_read(spark, root, version=0).select("id", "v")
    feed = lake.txn_changes(spark, root, 1, v4)
    ins = feed.filter("_change_type = 'insert'").select("id", "v")
    dels = feed.filter("_change_type = 'delete'").select("id", "v")
    replayed = base.unionByName(ins).exceptAll(dels)
    now = lake.txn_read(spark, root, version=v4).select("id", "v")
    assert replayed.exceptAll(now).isEmpty()
    assert now.exceptAll(replayed).isEmpty()
