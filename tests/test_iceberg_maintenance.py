"""Iceberg maintenance (r10): expire_snapshots + remove_orphans over
the continuously-exported tree — expired history's files go away,
carried (EXISTING) files and all retained snapshots survive byte-
identical, pinned reads of expired ids fail loudly, and the
incremental exporter keeps draining afterwards."""

import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import (
    iceberg_interop as ice,
    lake,
)


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fv", [2, 3])
def test_expire_keeps_current_state_exact(spark, tmp_path, fv):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 60).coalesce(2), root)
    ice.iceberg_export_incremental(root, iroot, format_version=fv)
    lake.txn_write(_d(spark, 100, 130).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    lake.txn_delete_dv(spark, root, spark.range(0, 7).select("id"), ["id"])
    ice.iceberg_export_incremental(root, iroot)

    before = _rows(ice.iceberg_read(spark, iroot))
    res = ice.iceberg_expire_snapshots(iroot, keep_last=1)
    assert res["expired"] == [1, 2]
    assert res["deleted_files"] > 0
    meta = ice.load_table_metadata(iroot)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [3]
    # current state byte-identical; expired pins fail loudly
    assert _rows(ice.iceberg_read(spark, iroot)) == before
    assert _rows(ice.iceberg_read(spark, iroot)) == _rows(
        lake.txn_read(spark, root)
    )
    with pytest.raises(ValueError, match="snapshot"):
        ice.iceberg_read(spark, iroot, snapshot_id=1)
    # carried EXISTING data files survived (counts still add up)
    if fv == 2:
        assert ice.iceberg_count(iroot) == lake.txn_count(root)
    # the exporter keeps draining from the retained stamp
    lake.txn_write(_d(spark, 500, 510).coalesce(1), root)
    assert ice.iceberg_export_incremental(root, iroot) == 4
    assert _rows(ice.iceberg_read(spark, iroot)) == _rows(
        lake.txn_read(spark, root)
    )


def test_expire_retains_requested_window(spark, tmp_path):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    for k in range(1, 4):
        lake.txn_write(_d(spark, 100 * k, 100 * k + 5).coalesce(1), root)
        ice.iceberg_export_incremental(root, iroot)
    n2 = ice.iceberg_read(spark, iroot, snapshot_id=3).count()
    res = ice.iceberg_expire_snapshots(iroot, keep_last=2)
    assert res["expired"] == [1, 2]
    # both retained snapshots still read
    assert ice.iceberg_read(spark, iroot, snapshot_id=3).count() == n2
    assert ice.iceberg_read(spark, iroot).count() == n2 + 5
    # idempotent second expire: nothing left to drop
    assert ice.iceberg_expire_snapshots(iroot, keep_last=2) == {
        "expired": [], "deleted_files": 0,
    }
    with pytest.raises(ValueError, match="keep_last"):
        ice.iceberg_expire_snapshots(iroot, keep_last=0)


def test_remove_orphans(spark, tmp_path):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 25).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    before = _rows(ice.iceberg_read(spark, iroot))
    # plant debris: a junk data file and a junk manifest-ish file
    junk1 = os.path.join(iroot, "data", "crashed-export.parquet")
    open(junk1, "wb").write(b"not parquet")
    junk2 = os.path.join(iroot, "metadata", "manifest-zzz.avro")
    open(junk2, "wb").write(b"junk")
    got = ice.iceberg_remove_orphans(iroot, dry_run=True)
    assert got == sorted(
        ["data/crashed-export.parquet", "metadata/manifest-zzz.avro"]
    )
    assert os.path.exists(junk1)  # dry run deleted nothing
    got = ice.iceberg_remove_orphans(iroot)
    assert got == sorted(
        ["data/crashed-export.parquet", "metadata/manifest-zzz.avro"]
    )
    assert not os.path.exists(junk1) and not os.path.exists(junk2)
    # live files untouched; a clean tree reports nothing
    assert _rows(ice.iceberg_read(spark, iroot)) == before
    assert ice.iceberg_remove_orphans(iroot) == []
