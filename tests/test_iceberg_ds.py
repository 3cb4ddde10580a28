"""format("iceberglog") — the Iceberg interop as a native read-only
Spark data source (r9): batch reads with field-id projection and
EXECUTOR-side position-delete masking, snapshot time travel, a
streaming source over snapshot sequence offsets (append-only contract
+ skipChangeCommits), and the continuous foreign-Iceberg -> native-
lake migration composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import (
    iceberg_interop as ice,
    lake,
)
from spark_cassandra_collabfiltering_spark.sources.iceberg_ds import (
    IcebergLogDataSource,
)


@pytest.fixture()
def ispark(spark):
    spark.dataSource.register(IcebergLogDataSource)
    return spark


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ds_read_matches_iceberg_read_with_dvs_and_time_travel(
    ispark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(ispark, 0, 120).coalesce(2), root, stats_cols=["id"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export_incremental(root, iroot)          # snapshot 1
    lake.txn_delete_dv(ispark, root,
                       ispark.range(0, 9).select("id"), ["id"])
    ice.iceberg_export_incremental(root, iroot)          # snapshot 2 (DV)
    got = ispark.read.format("iceberglog").option("root", iroot).load()
    assert _rows(got) == _rows(ice.iceberg_read(ispark, iroot))
    assert got.count() == 111  # executor-side position-delete mask
    # snapshot pinning (time travel to the pre-delete snapshot)
    pinned = (ispark.read.format("iceberglog")
              .option("root", iroot).option("snapshot", 1).load())
    assert pinned.count() == 120
    assert _rows(pinned) == _rows(
        ice.iceberg_read(ispark, iroot, snapshot_id=1)
    )


def test_ds_equality_delete_refusal(ispark, tmp_path):
    # build a table, then doctor an equality-delete entry in: the DS
    # must refuse toward iceberg_read
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    lake.txn_write(_d(ispark, 0, 10).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    # append an equality-delete manifest to the current manifest list
    meta = ice.load_table_metadata(iroot)
    snap = meta["snapshots"][-1]
    eqf = os.path.join(iroot, "data", "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([3], type=pa.int64())}), eqf)
    from spark_cassandra_collabfiltering_spark.sources import avro_source as av

    man = os.path.join(iroot, "metadata", "meq.avro")
    av.write_avro(
        [{"status": 1, "snapshot_id": 1, "sequence_number": 2,
          "file_sequence_number": 2,
          "data_file": {"content": 2, "file_path": "data/eq.parquet",
                        "file_format": "parquet", "partition": {},
                        "record_count": 1, "file_size_in_bytes": 1,
                        "equality_ids": [1]}}],
        ice._manifest_entry_schema(), man,
    )
    mlist_path = ice._resolve_path(iroot, snap["manifest-list"])
    rows = ice._read_avro_rows(mlist_path)
    rows = [
        {k: v for k, v in r.items() if k not in ("file", "corrupt_reason")}
        for r in rows
    ]
    rows.append({
        "manifest_path": "metadata/meq.avro",
        "manifest_length": os.path.getsize(man),
        "partition_spec_id": 0, "content": 1, "sequence_number": 2,
        "min_sequence_number": 2, "added_snapshot_id": 1,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 1,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    })
    av.write_avro(rows, ice._MANIFEST_LIST_SCHEMA, mlist_path)
    with pytest.raises(Exception, match="equality deletes"):
        (ispark.read.format("iceberglog")
         .option("root", iroot).load().collect())


@pytest.mark.slow
def test_ds_streaming_source_over_snapshots(ispark, tmp_path):
    """Offsets = snapshot sequence numbers: each drain reads exactly
    the appended files; a delete snapshot raises unless
    skipChangeCommits; the txnlake-sink composition is the continuous
    foreign-Iceberg -> lake migration, exactly-once."""
    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeDataSource,
    )

    ispark.dataSource.register(TxnLakeDataSource)
    src = str(tmp_path / "src")
    iroot = str(tmp_path / "ice")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    lake.txn_write(_d(ispark, 0, 25).coalesce(1), src)
    ice.iceberg_export_incremental(src, iroot)

    def drain(**opts):
        reader = (ispark.readStream.format("iceberglog")
                  .option("root", iroot))
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (reader.load()
             .writeStream.format("txnlake").option("root", dst)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    assert sorted(
        r["id"] for r in lake.txn_read(ispark, dst).collect()
    ) == list(range(25))

    lake.txn_write(_d(ispark, 100, 108).coalesce(1), src)
    ice.iceberg_export_incremental(src, iroot)
    drain()
    got = sorted(r["id"] for r in lake.txn_read(ispark, dst).collect())
    assert got == list(range(25)) + list(range(100, 108))

    # idempotent re-drain: nothing lands
    v_before = lake.txn_latest_version(dst)
    drain()
    assert lake.txn_latest_version(dst) == v_before

    # a DV snapshot is change churn: the stream refuses, then skips
    lake.txn_delete_dv(ispark, src, ispark.range(0, 2).select("id"),
                       ["id"])
    ice.iceberg_export_incremental(src, iroot)
    with pytest.raises(Exception, match="APPEND-ONLY"):
        drain()
    drain(skipChangeCommits="true")
    assert sorted(
        r["id"] for r in lake.txn_read(ispark, dst).collect()
    ) == got  # churn skipped, nothing new appended


def test_ds_write_refused(ispark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(ispark, 0, 5).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    with pytest.raises(Exception, match="read-only"):
        (_d(ispark, 0, 5).write.format("iceberglog")
         .option("root", iroot).mode("append").save())
