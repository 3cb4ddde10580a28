"""Read-only Apache Iceberg interop (r8): metadata-json -> manifest
list (Avro) -> manifests (Avro) -> parquet data files + v2 position
deletes, all through the repo's own from-scratch Avro reader. The
exporter round-trips the native txn lake; a HAND-AUTHORED metadata
tree (different code than the exporter, Spark-written parquet) pins
the reader against exporter quirks; refusals (format-version 3,
equality deletes, ORC files) are loud."""

import json
import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import (
    avro_source as av,
    iceberg_interop as ice,
    lake,
)


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_export_round_trips_with_dvs_and_metadata_count(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 200).coalesce(2), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 15).select("id"), ["id"])
    lake.txn_write(_d(spark, 500, 520).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    got = ice.iceberg_read(spark, iroot)
    assert _rows(got) == _rows(lake.txn_read(spark, root))
    assert ice.iceberg_count(iroot) == lake.txn_count(root) == 205


def test_export_restores_partition_columns(spark, tmp_path):
    # hive layouts strip the partition column from data files; Iceberg
    # files must CONTAIN every column — the exporter re-materializes it
    root = str(tmp_path / "t")
    d = spark.range(0, 60).select(
        "id", (F.col("id") % 3).cast("int").alias("bucket"),
        (F.col("id") * 7).alias("v"),
    )
    lake.txn_write(d.repartition(2), root, partition_by=["bucket"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    got = ice.iceberg_read(spark, iroot)
    assert dict(got.dtypes)["bucket"] == "int"
    assert _rows(got) == _rows(lake.txn_read(spark, root))
    # r9: the export records an IDENTITY partition spec and each
    # manifest entry carries its typed partition tuple, so a foreign
    # reader can prune from the manifests alone
    meta = ice.load_table_metadata(iroot)
    spec = meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("bucket", "identity")
    ]
    assert spec[0]["field-id"] == 1000
    snap = meta["snapshots"][-1]
    m = ice._read_avro_rows(
        ice._resolve_path(iroot, snap["manifest-list"])
    )[0]
    entries = ice._read_avro_rows(
        ice._resolve_path(iroot, m["manifest_path"])
    )
    vals = [e["data_file"]["partition"]["bucket"] for e in entries]
    assert sorted(set(vals)) == [0, 1, 2] and len(vals) == len(entries)


def test_export_collapses_column_mapping_to_logical_names(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 30).coalesce(1), root)
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "v", "speed")
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    got = ice.iceberg_read(spark, iroot)
    assert set(got.columns) == {"id", "speed"}
    assert _rows(got) == _rows(lake.txn_read(spark, root))


def test_hand_authored_foreign_table_reads(spark, tmp_path):
    """An Iceberg tree as another engine would lay it out: parquet
    written by plain Spark, manifests hand-built, one data file
    logically deleted via manifest status, one shrunk by a position-
    delete file, metadata under the uuid naming convention (no
    version-hint)."""
    root = str(tmp_path / "ext")
    meta = os.path.join(root, "metadata")
    data = os.path.join(root, "data")
    os.makedirs(meta)
    os.makedirs(data)

    def _part(df, name):
        tmpd = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(tmpd)
        src = next(f for f in os.listdir(tmpd) if f.endswith(".parquet"))
        dst = os.path.join(data, name)
        os.replace(os.path.join(tmpd, src), dst)
        return dst

    p0 = _part(_d(spark, 0, 10), "a.parquet")
    p1 = _part(_d(spark, 10, 20), "b.parquet")
    p2 = _part(_d(spark, 20, 30), "c.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdel = os.path.join(data, "del.parquet")
    pq.write_table(
        pa.table({
            "file_path": pa.array([p2, p2], type=pa.string()),
            "pos": pa.array([0, 5], type=pa.int64()),
        }),
        pdel,
    )
    entries = [
        {"status": 1, "snapshot_id": 9, "sequence_number": 1,
         "file_sequence_number": 1,
         "data_file": {"content": 0, "file_path": p0,
                       "file_format": "parquet", "partition": {},
                       "record_count": 10,
                       "file_size_in_bytes": 1,
                       "equality_ids": None}},
        {"status": 2, "snapshot_id": 9, "sequence_number": 1,
         "file_sequence_number": 1,  # DELETED: must not scan
         "data_file": {"content": 0, "file_path": p1,
                       "file_format": "parquet", "partition": {},
                       "record_count": 10,
                       "file_size_in_bytes": 1,
                       "equality_ids": None}},
        {"status": 0, "snapshot_id": 9, "sequence_number": 1,
         "file_sequence_number": 1,
         "data_file": {"content": 0, "file_path": p2,
                       "file_format": "parquet", "partition": {},
                       "record_count": 10,
                       "file_size_in_bytes": 1,
                       "equality_ids": None}},
        {"status": 1, "snapshot_id": 9, "sequence_number": 1,
         "file_sequence_number": 1,
         "data_file": {"content": 1, "file_path": pdel,
                       "file_format": "parquet", "partition": {},
                       "record_count": 2,
                       "file_size_in_bytes": 1,
                       "equality_ids": None}},
    ]
    man = os.path.join(meta, "m0.avro")
    av.write_avro(entries, ice._manifest_entry_schema(), man)
    mlist = os.path.join(meta, "snap-9.avro")
    av.write_avro(
        [{"manifest_path": man,
          "manifest_length": os.path.getsize(man),
          "partition_spec_id": 0, "content": 0, "sequence_number": 1,
          "min_sequence_number": 1, "added_snapshot_id": 9,
          "added_files_count": 4, "existing_files_count": 0,
          "deleted_files_count": 0, "added_rows_count": 20,
          "existing_rows_count": 0, "deleted_rows_count": 0}],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    tmeta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "last-sequence-number": 1, "last-updated-ms": 0,
        "last-column-id": 2,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999,
        "current-snapshot-id": 9,
        "snapshots": [{"snapshot-id": 9, "sequence-number": 1,
                       "timestamp-ms": 0, "manifest-list": mlist,
                       "schema-id": 0,
                       "summary": {"operation": "append"}}],
    }
    with open(os.path.join(meta, "00001-abcd.metadata.json"), "w") as fh:
        json.dump(tmeta, fh)
    got = ice.iceberg_read(spark, root)
    ids = sorted(r["id"] for r in got.collect())
    # p1 deleted entirely; p2 rows at positions 0 (id=20) and 5 (id=25)
    # hidden by the position-delete file
    assert ids == list(range(10)) + [
        i for i in range(20, 30) if i not in (20, 25)
    ]
    assert ice.iceberg_count(root) == 18


def test_refusals_are_loud(spark, tmp_path):
    # v3 reads natively since r10; the refusal line is now v4
    root = str(tmp_path / "ext")
    meta = os.path.join(root, "metadata")
    os.makedirs(meta)
    with open(os.path.join(meta, "v1.metadata.json"), "w") as fh:
        json.dump({"format-version": 4}, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("1")
    with pytest.raises(lake.UnsupportedProtocol, match="format-version"):
        ice.iceberg_read(spark, root)


def _entry(seq, content, path, nrows, eq_ids=None, status=1):
    return {
        "status": status, "snapshot_id": 1, "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": content, "file_path": path,
            "file_format": "PARQUET", "partition": {},
            "record_count": nrows, "file_size_in_bytes": 1,
            "equality_ids": eq_ids,
        },
    }


def _mlist_row(p, seq, content=0):
    return {
        "manifest_path": p, "manifest_length": os.path.getsize(p),
        "partition_spec_id": 0, "content": content,
        "sequence_number": seq, "min_sequence_number": 1,
        "added_snapshot_id": 1, "added_files_count": 1,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": 1, "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }


def test_equality_deletes_apply_with_sequence_semantics(spark, tmp_path):
    """v2 EQUALITY deletes (the Flink CDC shape, VERDICT r8 missing
    #3): a delete file's equality_ids column values remove matching
    rows from data files with STRICTLY lower data sequence numbers —
    a writer's own-commit inserts survive its deletes — and matching
    is NULL-SAFE (null deletes null). iceberg_count refuses under
    them: an equality delete's record_count counts predicates, not
    matched rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)  # v = 2*id
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)  # one data manifest at seq 1

    def _ice_file(name, rows):
        p = os.path.join(iroot, "data", name)
        pq.write_table(
            pa.table(
                [pa.array([r[0] for r in rows], type=pa.int64()),
                 pa.array([r[1] for r in rows], type=pa.int64())],
                schema=pa.schema([
                    pa.field("id", pa.int64(),
                             metadata={b"PARQUET:field_id": b"1"}),
                    pa.field("v", pa.int64(),
                             metadata={b"PARQUET:field_id": b"2"}),
                ]),
            ),
            p,
        )
        return p

    # seq-1 sibling file: two v=4 rows and one v=null row — all
    # below the delete's seq, so all must go
    f2 = _ice_file("f2.parquet", [(100, 4), (101, 4), (102, None)])
    # seq-2 file: v=4 again, but NOT strictly below seq 2 — survives
    f3 = _ice_file("f3.parquet", [(200, 4)])
    # the equality-delete file: delete v IN (4, NULL) at seq 2;
    # its own footer carries field id 2 for the column
    eqp = os.path.join(iroot, "data", "eqdel.parquet")
    pq.write_table(
        pa.table(
            [pa.array([4, None], type=pa.int64())],
            schema=pa.schema([
                pa.field("v", pa.int64(),
                         metadata={b"PARQUET:field_id": b"2"}),
            ]),
        ),
        eqp,
    )
    man1 = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    man2 = os.path.join(iroot, "metadata", "manifest-00002-data.avro")
    man3 = os.path.join(iroot, "metadata", "manifest-00003-del.avro")
    av.write_avro(
        [_entry(1, 0, f2, 3), _entry(2, 0, f3, 1)],
        ice._manifest_entry_schema(), man2,
    )
    av.write_avro(
        [_entry(2, 2, eqp, 2, eq_ids=[2])],
        ice._manifest_entry_schema(), man3,
    )
    mlist = os.path.join(iroot, "metadata", "snap-1-manifest-list.avro")
    av.write_avro(
        [_mlist_row(man1, 1), _mlist_row(man2, 2),
         _mlist_row(man3, 2, content=1)],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    got = ice.iceberg_read(spark, iroot)
    ids = sorted(r["id"] for r in got.collect())
    # from the export (v=2*id): v=4 removes id 2 only; the seq-1
    # fixture rows (v=4, v=4, v=null) all go; the seq-2 row survives
    assert ids == [0, 1] + list(range(3, 10)) + [200]
    with pytest.raises(lake.UnsupportedProtocol, match="equality"):
        ice.iceberg_count(iroot)


def test_position_deletes_respect_sequence_numbers(spark, tmp_path):
    """A position delete applies only to data files with data seq <=
    the delete's seq: a file REWRITTEN at a later seq sheds older
    position deletes (the compaction contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    man1 = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    # the exported data file's manifest-recorded path
    rows = [
        {k: v for k, v in r.items() if k not in ("file", "corrupt_reason")}
        for r in av.parse_avro_bytes(open(man1, "rb").read())
    ]
    data_rel = rows[0]["data_file"]["file_path"]
    # a position delete at seq 1 hits the seq-1 file ...
    pdel = os.path.join(iroot, "data", "pdel.parquet")
    pq.write_table(
        pa.table({
            "file_path": pa.array([data_rel], type=pa.string()),
            "pos": pa.array([0], type=pa.int64()),
        }),
        pdel,
    )
    # ... but the same file re-added at seq 2 (a rewrite) does not
    rows.append(_entry(2, 0, data_rel, 10))
    man2 = os.path.join(iroot, "metadata", "manifest-00002-data.avro")
    av.write_avro([rows[-1]], ice._manifest_entry_schema(), man2)
    mand = os.path.join(iroot, "metadata", "manifest-00003-del.avro")
    av.write_avro(
        [_entry(1, 1, pdel, 1)], ice._manifest_entry_schema(), mand
    )
    mlist = os.path.join(iroot, "metadata", "snap-1-manifest-list.avro")
    # snapshot A: seq-1 file + seq-1 delete -> row 0 hidden
    av.write_avro(
        [_mlist_row(man1, 1), _mlist_row(mand, 1, content=1)],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    assert sorted(
        r["id"] for r in ice.iceberg_read(spark, iroot).collect()
    ) == list(range(1, 10))
    # snapshot B: the SAME bytes re-added at seq 2 + the old delete ->
    # the delete no longer applies
    av.write_avro(
        [_mlist_row(man2, 2), _mlist_row(mand, 1, content=1)],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    assert sorted(
        r["id"] for r in ice.iceberg_read(spark, iroot).collect()
    ) == list(range(10))


def test_snapshot_pinning(spark, tmp_path):
    """Two snapshots in one metadata file: pinning reads the old one."""
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 20).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    # append a second snapshot by hand (new manifest + list + metadata)
    meta = ice.load_table_metadata(iroot)
    data = os.path.join(iroot, "data")
    p_new = os.path.join(data, "extra.parquet")
    tmpd = str(tmp_path / "stage")
    _d(spark, 100, 105).coalesce(1).write.parquet(tmpd)
    src = next(f for f in os.listdir(tmpd) if f.endswith(".parquet"))
    os.replace(os.path.join(tmpd, src), p_new)
    man0 = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    man1 = os.path.join(iroot, "metadata", "manifest-00001.avro")
    av.write_avro(
        [{"status": 1, "snapshot_id": 2, "sequence_number": 2,
          "file_sequence_number": 2,
          "data_file": {"content": 0, "file_path": p_new,
                        "file_format": "parquet", "partition": {},
                        "record_count": 5,
                        "file_size_in_bytes": 1,
                        "equality_ids": None}}],
        ice._manifest_entry_schema(), man1,
    )
    mlist2 = os.path.join(iroot, "metadata", "snap-2-manifest-list.avro")
    mk = lambda p: {  # noqa: E731
        "manifest_path": p, "manifest_length": os.path.getsize(p),
        "partition_spec_id": 0, "content": 0, "sequence_number": 2,
        "min_sequence_number": 1, "added_snapshot_id": 2,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 5,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }
    av.write_avro([mk(man0), mk(man1)], ice._MANIFEST_LIST_SCHEMA, mlist2)
    meta["snapshots"].append({
        "snapshot-id": 2, "sequence-number": 2, "timestamp-ms": 1,
        "manifest-list": mlist2, "schema-id": 0,
        "summary": {"operation": "append"},
    })
    meta["current-snapshot-id"] = 2
    with open(os.path.join(iroot, "metadata", "v2.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(iroot, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("2")
    assert ice.iceberg_read(spark, iroot).count() == 25
    assert ice.iceberg_read(spark, iroot, snapshot_id=1).count() == 20
    assert ice.iceberg_count(iroot) == 25
    assert ice.iceberg_count(iroot, snapshot_id=1) == 20


def test_field_id_resolution_survives_a_foreign_rename(spark, tmp_path):
    """Rename a column in the metadata json only (id stable, name
    changed — what an Iceberg engine's ALTER TABLE RENAME does): the
    reader must resolve the column by FIELD ID from the parquet
    footers and return the same values under the new name."""
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 25).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    mp = ice._latest_metadata_path(iroot)
    meta = json.load(open(mp))
    for f in meta["schemas"][0]["fields"]:
        if f["name"] == "v":
            f["name"] = "velocity"  # id unchanged
    json.dump(meta, open(mp, "w"))
    got = ice.iceberg_read(spark, iroot)
    assert set(got.columns) == {"id", "velocity"}
    assert sorted((r["id"], r["velocity"]) for r in got.collect()) == [
        (i, i * 2) for i in range(25)
    ]


def test_mixed_id_signatures_scan_per_group(spark, tmp_path):
    """Two files storing the same field id under DIFFERENT physical
    names (one written before a rename, one after) read back as one
    coherent column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    # hand-add a second data file whose column 2 is physically named
    # 'velocity' but carries the same field id 2
    data_dir = os.path.join(iroot, "data")
    t2 = pa.table(
        [pa.array(range(100, 105), type=pa.int64()),
         pa.array([x * 2 for x in range(100, 105)], type=pa.int64())],
        schema=pa.schema([
            pa.field("id", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("velocity", pa.int64(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ]),
    )
    p2 = os.path.join(data_dir, "renamed.parquet")
    pq.write_table(t2, p2)
    man = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    rows = [
        {k: v for k, v in r.items() if k not in ("file", "corrupt_reason")}
        for r in av.parse_avro_bytes(open(man, "rb").read())
    ]
    rows.append({"status": 1, "snapshot_id": 1, "sequence_number": 1,
                 "file_sequence_number": 1,
                 "data_file": {"content": 0, "file_path": p2,
                               "file_format": "PARQUET", "partition": {},
                               "record_count": 5,
                               "file_size_in_bytes": 1,
                               "equality_ids": None}})
    av.write_avro(rows, ice._manifest_entry_schema(), man)
    got = ice.iceberg_read(spark, iroot)
    vals = {r["id"]: r["v"] for r in got.collect()}
    assert vals == {i: i * 2 for i in list(range(10)) + list(range(100, 105))}


def test_iceberg_import_round_trips(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 80).coalesce(2), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 6).select("id"), ["id"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    back = str(tmp_path / "back")
    ice.iceberg_import(spark, iroot, back, stats_cols=["id"])
    assert _rows(lake.txn_read(spark, back)) == _rows(
        lake.txn_read(spark, root)
    )
    assert lake.txn_count(back) == 74


def _export_fixture(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 40).coalesce(1), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 4).select("id"), ["id"])
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    return iroot


def test_export_manifests_are_spec_shaped(spark, tmp_path):
    """The parts real readers resolve by (ADVICE r8): container
    metadata keys, field-id annotations, the required partition
    struct, data/deletes manifest split, table-relative paths."""
    iroot = _export_fixture(spark, tmp_path)
    man = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    blob = open(man, "rb").read()
    meta_kv, _ = av._read_meta_map(blob, len(av.MAGIC))
    for key in ("schema", "partition-spec", "format-version", "content"):
        assert key in meta_kv, f"manifest lacks required metadata {key}"
    assert meta_kv["content"] == b"data"
    sch = json.loads(meta_kv["avro.schema"])
    by_name = {f["name"]: f for f in sch["fields"]}
    assert by_name["status"]["field-id"] == 0
    assert by_name["data_file"]["field-id"] == 2
    df_fields = {
        f["name"]: f for f in by_name["data_file"]["type"]["fields"]
    }
    assert df_fields["file_path"]["field-id"] == 100
    assert df_fields["partition"]["field-id"] == 102
    assert df_fields["content"]["field-id"] == 134
    for r in av.parse_avro_bytes(blob):
        assert not r["corrupt_reason"]
        assert not os.path.isabs(r["data_file"]["file_path"])
    dman = os.path.join(iroot, "metadata", "manifest-00001-deletes.avro")
    dmeta, _ = av._read_meta_map(open(dman, "rb").read(), len(av.MAGIC))
    assert dmeta["content"] == b"deletes"


def test_export_validates_against_pyiceberg_when_available(
    spark, tmp_path
):
    """Foreign-reader validation (ADVICE r8): when pyiceberg is
    installed, it must load the exported table and return the same
    rows — proving the export is spec-real, not just self-consistent.
    Skips where pyiceberg is absent (not in this container); the
    spec-shape pins above run everywhere."""
    iroot = _export_fixture(spark, tmp_path)
    try:
        from pyiceberg.table import StaticTable
    except ImportError:
        pytest.skip("pyiceberg not installed in this environment")
    t = StaticTable.from_metadata(
        os.path.join(iroot, "metadata", "v1.metadata.json")
    )
    got = t.scan().to_arrow().to_pylist()
    assert sorted((r["id"], r["v"]) for r in got) == [
        (i, i * 2) for i in range(4, 40)
    ]


# ---------------------------------------------------------------------------
# incremental export (r9 — the Iceberg mirror of
# delta_export_incremental): one appended snapshot per txn commit,
# exactly-once on the summary's txnlake-export-version stamp, time
# travel across the exported history, adoption/schema-change refusals.
# ---------------------------------------------------------------------------


def test_incremental_export_appends_snapshots_and_time_travels(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 100).coalesce(2), root, stats_cols=["id"])
    # drain 1: full export of v0
    s1 = ice.iceberg_export_incremental(root, iroot)
    assert s1 == 1
    assert _rows(ice.iceberg_read(spark, iroot)) == _rows(
        lake.txn_read(spark, root, version=0)
    )
    # two more commits: an append and a DV delete
    lake.txn_write(_d(spark, 500, 530).coalesce(1), root)
    lake.txn_delete_dv(spark, root, spark.range(0, 7).select("id"), ["id"])
    # drain 2: exactly the two new commits, one snapshot each
    s3 = ice.iceberg_export_incremental(root, iroot)
    assert s3 == 3
    meta = ice.load_table_metadata(iroot)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [1, 2, 3]
    assert meta["current-snapshot-id"] == 3
    # advisory operation labels: the append commit reads as append,
    # the DV commit (rows hidden, no files added) as delete
    ops = {s["snapshot-id"]: s["summary"]["operation"]
           for s in meta["snapshots"]}
    assert ops[2] == "append" and ops[3] == "delete"
    # current state matches the lake
    assert _rows(ice.iceberg_read(spark, iroot)) == _rows(
        lake.txn_read(spark, root)
    )
    # TIME TRAVEL: every exported snapshot equals its txn version
    for snap_id, v in ((1, 0), (2, 1), (3, 2)):
        assert _rows(
            ice.iceberg_read(spark, iroot, snapshot_id=snap_id)
        ) == _rows(lake.txn_read(spark, root, version=v)), (snap_id, v)
    # counts stay metadata-only
    assert ice.iceberg_count(iroot) == lake.txn_count(root) == 123


def test_incremental_export_is_idempotent_across_retries(spark, tmp_path):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 50).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    before = sorted(os.listdir(os.path.join(iroot, "metadata")))
    # retry drain with NO new commits: nothing lands
    sid = ice.iceberg_export_incremental(root, iroot)
    assert sid == 1
    assert sorted(os.listdir(os.path.join(iroot, "metadata"))) == before
    # a crashed-then-retried drain after one commit lands it ONCE
    lake.txn_write(_d(spark, 100, 110).coalesce(1), root)
    assert ice.iceberg_export_incremental(root, iroot) == 2
    assert ice.iceberg_export_incremental(root, iroot) == 2
    meta = ice.load_table_metadata(iroot)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [1, 2]


def test_incremental_export_carries_files_as_existing(spark, tmp_path):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 40).coalesce(2), root)
    ice.iceberg_export_incremental(root, iroot)
    lake.txn_write(_d(spark, 200, 210).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    meta = ice.load_table_metadata(iroot)
    snap = [s for s in meta["snapshots"] if s["snapshot-id"] == 2][0]
    mlist = ice._read_avro_rows(
        ice._resolve_path(iroot, snap["manifest-list"])
    )
    data_m = [m for m in mlist if int(m.get("content") or 0) == 0][0]
    # the two v0 files carry as EXISTING with their ORIGINAL sequence
    # number; the appended file is ADDED at the new sequence
    assert data_m["existing_files_count"] == 2
    assert data_m["added_files_count"] == 1
    entries = ice._read_avro_rows(
        ice._resolve_path(iroot, data_m["manifest_path"])
    )
    ex = [e for e in entries if e["status"] == 0]
    ad = [e for e in entries if e["status"] == 1]
    assert {e["sequence_number"] for e in ex} == {1}
    assert {e["snapshot_id"] for e in ex} == {1}
    assert {e["sequence_number"] for e in ad} == {2}
    # and the carried parquet was NOT rewritten (same exported path)
    snap1 = [s for s in meta["snapshots"] if s["snapshot-id"] == 1][0]
    m1 = ice._read_avro_rows(
        ice._resolve_path(iroot, snap1["manifest-list"])
    )[0]
    e1_paths = {
        e["data_file"]["file_path"]
        for e in ice._read_avro_rows(
            ice._resolve_path(iroot, m1["manifest_path"])
        )
    }
    assert {e["data_file"]["file_path"] for e in ex} == e1_paths


def test_incremental_export_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    # foreign table (no summary stamp): cannot adopt — build one by
    # stripping the stamp from a real export
    iroot = str(tmp_path / "foreign")
    ice.iceberg_export(root, iroot)
    mp = ice._latest_metadata_path(iroot)
    meta = json.load(open(mp))
    for s in meta["snapshots"]:
        s["summary"].pop("txnlake-export-version", None)
    json.dump(meta, open(mp, "w"))
    lake.txn_write(_d(spark, 20, 30).coalesce(1), root)
    with pytest.raises(ValueError, match="adopt"):
        ice.iceberg_export_incremental(root, iroot)
    # schema change since the last export: refuse, advise full export
    iroot2 = str(tmp_path / "ice2")
    root2 = str(tmp_path / "t2")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root2)
    ice.iceberg_export_incremental(root2, iroot2)
    lake.txn_enable_column_mapping(root2)
    lake.txn_rename_column(root2, "v", "val")
    lake.txn_write(
        spark.range(50, 60).select("id", (F.col("id") * 2).alias("val"))
        .coalesce(1),
        root2,
    )
    with pytest.raises(ValueError, match="schema changed"):
        ice.iceberg_export_incremental(root2, iroot2)


def test_incremental_append_scan(spark, tmp_path):
    """iceberg_appends: rows appended by snapshots after a given
    snapshot — the read twin of the incremental export; refuses
    across non-append churn."""
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 30).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)          # snapshot 1
    lake.txn_write(_d(spark, 100, 110).coalesce(1), root)
    lake.txn_write(_d(spark, 200, 205).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)          # snapshots 2, 3
    # everything appended since snapshot 1
    got = sorted(
        r["id"] for r in ice.iceberg_appends(spark, iroot, 1).collect()
    )
    assert got == list(range(100, 110)) + list(range(200, 205))
    # bounded range: only snapshot 2's rows
    got2 = sorted(
        r["id"]
        for r in ice.iceberg_appends(spark, iroot, 1, 2).collect()
    )
    assert got2 == list(range(100, 110))
    # nothing after the current snapshot
    assert ice.iceberg_appends(spark, iroot, 3).count() == 0
    # a DV (delete churn) in range refuses loudly
    lake.txn_delete_dv(spark, root, spark.range(0, 3).select("id"), ["id"])
    ice.iceberg_export_incremental(root, iroot)          # snapshot 4: delete
    with pytest.raises(ValueError, match="not append"):
        ice.iceberg_appends(spark, iroot, 1)
    # but the pre-churn range still scans
    assert len(ice.iceberg_appends(spark, iroot, 1, 3).collect()) == 15
    # unknown snapshot ids refuse
    with pytest.raises(ValueError, match="unknown"):
        ice.iceberg_appends(spark, iroot, 99)


def test_orc_data_files_read_when_delete_free(spark, tmp_path):
    """r9 (VERDICT r8 missing #3, second half): an Iceberg table whose
    data files are ORC reads natively (name-based resolution, typed
    NULL for absent columns) when the snapshot carries no deletes;
    with deletes in play ORC refuses loudly — ORC scans expose no
    _metadata.row_index to key position deletes on."""
    root = str(tmp_path / "ext")
    meta = os.path.join(root, "metadata")
    data = os.path.join(root, "data")
    os.makedirs(meta)
    os.makedirs(data)

    def _orc_part(df, name):
        tmpd = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.format("orc").save(tmpd)
        src = next(f for f in os.listdir(tmpd) if f.endswith(".orc"))
        dst = os.path.join(data, name)
        os.replace(os.path.join(tmpd, src), dst)
        return dst

    p0 = _orc_part(_d(spark, 0, 10), "a.orc")
    # an evolved parquet file alongside (mixed-format table) with an
    # extra column the schema knows about
    import pyarrow as pa
    import pyarrow.parquet as pq

    p1 = os.path.join(data, "b.parquet")
    pq.write_table(
        pa.table({
            "id": pa.array(range(10, 15), type=pa.int64()),
            "v": pa.array([i * 2 for i in range(10, 15)],
                          type=pa.int64()),
            "extra": pa.array([9] * 5, type=pa.int64()),
        }),
        p1,
    )

    def _entry(path, fmt, nrows):
        return {"status": 1, "snapshot_id": 9, "sequence_number": 1,
                "file_sequence_number": 1,
                "data_file": {"content": 0, "file_path": path,
                              "file_format": fmt, "partition": {},
                              "record_count": nrows,
                              "file_size_in_bytes": 1,
                              "equality_ids": None}}

    man = os.path.join(meta, "m0.avro")
    av.write_avro(
        [_entry(p0, "orc", 10), _entry(p1, "parquet", 5)],
        ice._manifest_entry_schema(), man,
    )
    mlist = os.path.join(meta, "snap-9.avro")
    av.write_avro(
        [{"manifest_path": man, "manifest_length": os.path.getsize(man),
          "partition_spec_id": 0, "content": 0, "sequence_number": 1,
          "min_sequence_number": 1, "added_snapshot_id": 9,
          "added_files_count": 2, "existing_files_count": 0,
          "deleted_files_count": 0, "added_rows_count": 15,
          "existing_rows_count": 0, "deleted_rows_count": 0}],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    tmeta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "last-sequence-number": 1, "last-updated-ms": 0,
        "last-column-id": 3,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
            {"id": 3, "name": "extra", "required": False,
             "type": "long"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999,
        "current-snapshot-id": 9,
        "snapshots": [{"snapshot-id": 9, "sequence-number": 1,
                       "timestamp-ms": 0, "manifest-list": mlist,
                       "schema-id": 0,
                       "summary": {"operation": "append"}}],
    }
    with open(os.path.join(meta, "v1.metadata.json"), "w") as fh:
        json.dump(tmeta, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("1")

    got = {r["id"]: r for r in ice.iceberg_read(spark, root).collect()}
    assert sorted(got) == list(range(15))
    assert got[3]["v"] == 6 and got[3]["extra"] is None  # ORC: no extra
    assert got[12]["extra"] == 9                          # parquet has it
    assert ice.iceberg_count(root) == 15

    # now a position-delete lands: the ORC-bearing snapshot refuses
    pdel = os.path.join(data, "del.parquet")
    pq.write_table(
        pa.table({"file_path": pa.array([p1], type=pa.string()),
                  "pos": pa.array([0], type=pa.int64())}), pdel,
    )
    man2 = os.path.join(meta, "m1.avro")
    av.write_avro(
        [_entry(p0, "orc", 10), _entry(p1, "parquet", 5),
         {"status": 1, "snapshot_id": 10, "sequence_number": 2,
          "file_sequence_number": 2,
          "data_file": {"content": 1, "file_path": pdel,
                        "file_format": "parquet", "partition": {},
                        "record_count": 1, "file_size_in_bytes": 1,
                        "equality_ids": None}}],
        ice._manifest_entry_schema(), man2,
    )
    mlist2 = os.path.join(meta, "snap-10.avro")
    av.write_avro(
        [{"manifest_path": man2,
          "manifest_length": os.path.getsize(man2),
          "partition_spec_id": 0, "content": 0, "sequence_number": 2,
          "min_sequence_number": 1, "added_snapshot_id": 10,
          "added_files_count": 1, "existing_files_count": 2,
          "deleted_files_count": 0, "added_rows_count": 1,
          "existing_rows_count": 15, "deleted_rows_count": 0}],
        ice._MANIFEST_LIST_SCHEMA, mlist2,
    )
    tmeta["snapshots"].append(
        {"snapshot-id": 10, "sequence-number": 2, "timestamp-ms": 0,
         "manifest-list": mlist2, "schema-id": 0,
         "summary": {"operation": "delete"}})
    tmeta["current-snapshot-id"] = 10
    tmeta["last-sequence-number"] = 2
    with open(os.path.join(meta, "v2.metadata.json"), "w") as fh:
        json.dump(tmeta, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(ValueError, match="delete-free"):
        ice.iceberg_read(spark, root)
    # the delete-free snapshot still time-travels
    assert ice.iceberg_read(spark, root, snapshot_id=9).count() == 15
