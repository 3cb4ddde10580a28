"""Iceberg v3 (r10): deletion vectors in Puffin files — written by the
exporter (``format_version=3``), decoded by iceberg_read (driver-side,
metadata-sized) and by format("iceberglog") (executor-side seek-reads),
sharing the roaring codec with delta_dv; v3 ``initial-default`` column
values; refusals (position-delete FILES in v3, format-version 4,
corrupt DV blobs, compressed Puffin footers) are loud."""

import json
import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import (
    avro_source as av,
    iceberg_interop as ice,
    lake,
    puffin,
)


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_v3_export_round_trips_with_dvs(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 200).coalesce(2), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 15).select("id"), ["id"])
    lake.txn_write(_d(spark, 500, 520).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot, format_version=3)

    meta = ice.load_table_metadata(iroot)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 220
    got = ice.iceberg_read(spark, iroot)
    assert _rows(got) == _rows(lake.txn_read(spark, root))
    # metadata-only count still works: DV record_count IS cardinality
    assert ice.iceberg_count(iroot) == lake.txn_count(root) == 205

    # the deletes are ONE puffin file, entries addressed by offset
    data, pos_del, eq_del = ice.snapshot_files(iroot)
    assert eq_del == []
    assert pos_del and all(d["_dv"] for d in pos_del)
    assert {d["file_path"] for d in pos_del} == {"data/s1-dvs.puffin"}
    assert all(d["file_format"] == "PUFFIN" for d in pos_del)
    refs = {d["referenced_data_file"] for d in pos_del}
    assert refs <= {d2["file_path"] for d2 in data}
    # the puffin footer is spec-shaped and agrees with the manifest
    foot = puffin.read_puffin_footer(
        os.path.join(iroot, "data", "s1-dvs.puffin")
    )
    by_ref = {
        b["properties"]["referenced-data-file"]: b for b in foot["blobs"]
    }
    for d in pos_del:
        b = by_ref[d["referenced_data_file"]]
        assert b["type"] == "deletion-vector-v1"
        assert b["offset"] == d["content_offset"]
        assert b["length"] == d["content_size_in_bytes"]
        assert int(b["properties"]["cardinality"]) == d["record_count"]


def test_v3_incremental_export_appends_and_dvs(spark, tmp_path):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 50).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot, format_version=3)
    lake.txn_write(_d(spark, 100, 120).coalesce(1), root)
    lake.txn_delete_dv(
        spark, root, spark.range(0, 5).select("id"), ["id"]
    )
    sid = ice.iceberg_export_incremental(root, iroot)
    assert sid == 3
    meta = ice.load_table_metadata(iroot)
    assert meta["format-version"] == 3
    # row lineage advances on the append, holds on the DV snapshot
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert snaps[1]["first-row-id"] == 0
    assert snaps[2]["first-row-id"] == 50
    assert meta["next-row-id"] == 70
    assert _rows(ice.iceberg_read(spark, iroot)) == _rows(
        lake.txn_read(spark, root)
    )
    # time travel: pre-DV snapshot still shows the deleted rows
    assert ice.iceberg_read(spark, iroot, snapshot_id=2).count() == 70
    assert ice.iceberg_read(spark, iroot, snapshot_id=3).count() == 65
    # a second drain with nothing new is a no-op
    assert ice.iceberg_export_incremental(root, iroot) == 3


def test_v3_iceberglog_ds_masks_dvs_in_task(spark, tmp_path):
    from spark_cassandra_collabfiltering_spark.sources.iceberg_ds import (
        IcebergLogDataSource,
    )

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 120).coalesce(2), root)
    lake.txn_delete_dv(spark, root, spark.range(0, 9).select("id"), ["id"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot, format_version=3)
    spark.dataSource.register(IcebergLogDataSource)
    got = spark.read.format("iceberglog").option("root", iroot).load()
    assert got.count() == 111
    assert _rows(got) == _rows(ice.iceberg_read(spark, iroot))


def test_v3_refuses_position_delete_files(spark, tmp_path):
    # a v2 export with a parquet position-delete file, relabeled v3:
    # the reader must refuse (the v3 spec requires DVs)
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 30).coalesce(1), root)
    lake.txn_delete_dv(spark, root, spark.range(0, 3).select("id"), ["id"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)  # v2: parquet delete file
    mp = ice._latest_metadata_path(iroot)
    meta = json.load(open(mp))
    meta["format-version"] = 3
    json.dump(meta, open(mp, "w"))
    with pytest.raises(lake.UnsupportedProtocol, match="deletion vector"):
        ice.iceberg_read(spark, iroot)


def test_format_version_4_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 5).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    mp = ice._latest_metadata_path(iroot)
    meta = json.load(open(mp))
    meta["format-version"] = 4
    json.dump(meta, open(mp, "w"))
    with pytest.raises(lake.UnsupportedProtocol, match="format-version"):
        ice.iceberg_read(spark, iroot)
    with pytest.raises(ValueError, match="format_version"):
        ice.iceberg_export(root, str(tmp_path / "ice4"), format_version=4)


def test_v3_initial_default_surfaces_for_old_files(spark, tmp_path):
    """A column added with ``initial-default``: rows in files written
    before the column existed surface the default, not NULL."""
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot, format_version=3)
    mp = ice._latest_metadata_path(iroot)
    meta = json.load(open(mp))
    sch = meta["schemas"][0]
    sch["fields"].append({
        "id": len(sch["fields"]) + 1, "name": "bonus",
        "type": "long", "required": False, "initial-default": 7,
    })
    meta["last-column-id"] = len(sch["fields"])
    json.dump(meta, open(mp, "w"))
    got = ice.iceberg_read(spark, iroot)
    assert dict(got.dtypes)["bonus"] == "bigint"
    assert {r["bonus"] for r in got.collect()} == {7}
    # non-primitive initial-default refuses loudly
    sch["fields"][-1] = {
        "id": len(sch["fields"]), "name": "blob", "required": False,
        "type": "binary", "initial-default": "AAAA",
    }
    json.dump(meta, open(mp, "w"))
    with pytest.raises(lake.UnsupportedProtocol, match="initial-default"):
        ice.iceberg_read(spark, iroot)


def test_corrupt_dv_blob_is_loud(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 40).coalesce(1), root)
    lake.txn_delete_dv(spark, root, spark.range(0, 4).select("id"), ["id"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot, format_version=3)
    p = os.path.join(iroot, "data", "s1-dvs.puffin")
    _, pos_del, _ = ice.snapshot_files(iroot)
    off = int(pos_del[0]["content_offset"])
    b = bytearray(open(p, "rb").read())
    b[off + 6] ^= 0xFF
    open(p, "wb").write(bytes(b))
    with pytest.raises(ValueError, match="CRC|magic"):
        ice.iceberg_read(spark, iroot).collect()


def test_puffin_footer_refuses_compressed_payload(tmp_path):
    p = str(tmp_path / "dv.puffin")
    puffin.write_puffin_dvs(p, {"f": [1, 2]}, 1, 1)
    b = bytearray(open(p, "rb").read())
    b[-8] |= 1  # flags byte 0 bit 0: payload compressed
    open(p, "wb").write(bytes(b))
    with pytest.raises(ValueError, match="compressed"):
        puffin.read_puffin_footer(p)


def test_v3_row_ids_are_stable_across_snapshots(spark, tmp_path):
    """with_row_ids: _row_id = the file's EXPLICIT first_row_id + row
    position. Carried EXISTING entries keep their assigned ids, so a
    row's id never changes across later appends, and DV-deleted rows'
    ids vanish without being reissued."""
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 40).coalesce(2), root)
    ice.iceberg_export_incremental(root, iroot, format_version=3)
    ids1 = {
        r["id"]: r["_row_id"]
        for r in ice.iceberg_read(
            spark, iroot, with_row_ids=True
        ).collect()
    }
    assert sorted(ids1.values()) == list(range(40))
    lake.txn_write(_d(spark, 100, 110).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    ids2 = {
        r["id"]: r["_row_id"]
        for r in ice.iceberg_read(
            spark, iroot, with_row_ids=True
        ).collect()
    }
    # old rows keep their ids; appended rows claim the next block
    assert all(ids2[k] == v for k, v in ids1.items())
    assert sorted(
        v for k, v in ids2.items() if k >= 100
    ) == list(range(40, 50))
    lake.txn_delete_dv(spark, root, spark.range(0, 5).select("id"), ["id"])
    ice.iceberg_export_incremental(root, iroot)
    ids3 = {
        r["id"]: r["_row_id"]
        for r in ice.iceberg_read(
            spark, iroot, with_row_ids=True
        ).collect()
    }
    assert set(ids3) == set(ids2) - {0, 1, 2, 3, 4}
    assert all(ids3[k] == ids2[k] for k in ids3)  # survivors stable
    # deleted ids are gone, not reissued
    dead = {ids2[k] for k in (0, 1, 2, 3, 4)}
    assert dead.isdisjoint(set(ids3.values()))


def test_row_ids_refuse_below_v3_and_without_assignment(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)  # v2
    with pytest.raises(lake.UnsupportedProtocol, match="v3"):
        ice.iceberg_read(spark, iroot, with_row_ids=True)
    # a v3 table whose entries lack explicit first_row_id refuses
    # (inheritance mid-commit is a writer concern, not a read path)
    iroot3 = str(tmp_path / "ice3")
    ice.iceberg_export(root, iroot3, format_version=3)
    mp = ice._latest_metadata_path(iroot3)
    meta = json.load(open(mp))
    man = os.path.join(iroot3, "metadata", "manifest-00000-data.avro")
    rows = [
        {k: v for k, v in r.items() if k not in ("file", "corrupt_reason")}
        for r in av.parse_avro_bytes(open(man, "rb").read())
    ]
    for r in rows:
        r["data_file"]["first_row_id"] = None
    av.write_avro(
        rows, ice._manifest_entry_schema(v3=True), man,
        extra_meta={"format-version": "3", "content": "data"},
    )
    with pytest.raises(lake.UnsupportedProtocol, match="first_row_id"):
        ice.iceberg_read(spark, iroot3, with_row_ids=True)
    assert meta["format-version"] == 3
