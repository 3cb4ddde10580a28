"""Round-10 ADVICE pins (all five r9 findings).

1. iceberg_export_incremental keyed carried files by bare basename;
   a basename collision across commits silently carried a NEW file as
   EXISTING pointing at a DIFFERENT file's exported rows. Now keyed by
   md5(full txn path)[:10] embedded in the exported name (the
   delta_interop._export_file scheme).
2. Equality-delete groups resolved field ids from files[0]'s footer
   only; files whose footers disagree (rename mid-history) read NULL
   and eqNullSafe then silently deleted NULL-keyed rows. Now resolved
   per delete file, scanned per distinct signature.
3. iceberg_export_incremental replayed the txn log once PER drained
   version (O(V^2)); now one _ReplayCursor advances across the range.
4. avro parse's schema-resolution build caught only (ValueError,
   KeyError); malformed reader defaults raising TypeError escaped the
   bad_schema quarantine and crashed the task. Now any build failure
   quarantines.
5. iceberg_ds masked position deletes with a per-row Python loop;
   now a vectorized numpy boolean mask.
"""

import json
import os

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


# --- finding 1: basename collision across commits -----------------------


def test_incremental_export_survives_basename_collision(spark, tmp_path):
    """Two commits whose data files share a bare basename (the lake
    disclaims basename uniqueness — lake.py's stats are keyed by full
    path for exactly this reason): the second file must be materialized
    as ADDED, never carried as EXISTING onto the first file's export."""
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    v0_file = lake._replay(root, 0).files[0]

    lake.txn_write(_d(spark, 100, 105).coalesce(1), root)
    old = [f for f in lake._replay(root, 1).files if f != v0_file][0]
    # force the collision: same basename, different directory/content
    new = os.path.join(os.path.dirname(old), os.path.basename(v0_file))
    os.rename(old, new)
    cpath = os.path.join(lake._log_dir(root), f"{1:020d}.json")
    txt = open(cpath).read()
    assert old in txt
    with open(cpath, "w") as fh:
        fh.write(txt.replace(old, new))
    assert _rows(lake.txn_read(spark, root)) == _rows(
        _d(spark, 0, 10).union(_d(spark, 100, 105))
    )

    ice.iceberg_export_incremental(root, iroot)
    got = ice.iceberg_read(spark, iroot)
    assert _rows(got) == _rows(lake.txn_read(spark, root))

    # and the new file really was ADDED (not mis-carried as EXISTING)
    meta = ice.load_table_metadata(iroot)
    snap = [s for s in meta["snapshots"] if s["snapshot-id"] == 2][0]
    data_m = [
        m
        for m in ice._read_avro_rows(
            ice._resolve_path(iroot, snap["manifest-list"])
        )
        if int(m.get("content") or 0) == 0
    ][0]
    assert data_m["added_files_count"] == 1
    assert data_m["existing_files_count"] == 1


def test_src_digest_parses_only_digest_named_exports():
    assert (
        ice._src_digest("data/s2-00001-0123456789-part-0.parquet")
        == "0123456789"
    )
    # pre-digest export shape: no digest -> None (file re-materializes
    # instead of being carried on an unsafe basename match)
    assert ice._src_digest("data/s1-00000-part-0.parquet") is None


# --- finding 2: per-file equality-delete footer resolution --------------


def test_eq_delete_group_resolves_footers_per_file(spark, tmp_path):
    """Two delete files in ONE (ids, seq) group whose footers map field
    id 2 to DIFFERENT physical names: both must apply. The old
    files[0]-only resolution read NULL out of the renamed file, so its
    predicate silently vanished (and NULL-keyed data rows were at risk
    of deletion via eqNullSafe)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)  # v = 2*id
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)

    def _eq_file(name, phys, vals):
        p = os.path.join(iroot, "data", name)
        pq.write_table(
            pa.table(
                [pa.array(vals, type=pa.int64())],
                schema=pa.schema([
                    pa.field(phys, pa.int64(),
                             metadata={b"PARQUET:field_id": b"2"}),
                ]),
            ),
            p,
        )
        return p

    eq_a = _eq_file("eq_a.parquet", "v", [4])           # deletes id 2
    eq_b = _eq_file("eq_b.parquet", "v_renamed", [8])   # deletes id 4
    man1 = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    mand = os.path.join(iroot, "metadata", "manifest-00009-del.avro")
    av.write_avro(
        [_entry(2, 2, eq_a, 1, eq_ids=[2]),
         _entry(2, 2, eq_b, 1, eq_ids=[2])],
        ice._manifest_entry_schema(), mand,
    )
    mlist = os.path.join(iroot, "metadata", "snap-1-manifest-list.avro")
    av.write_avro(
        [_mlist_row(man1, 1), _mlist_row(mand, 2, content=1)],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    ids = sorted(r["id"] for r in ice.iceberg_read(spark, iroot).collect())
    assert ids == [0, 1, 3, 5, 6, 7, 8, 9]


# --- finding 3: one replay cursor per drain -----------------------------


def test_incremental_export_drains_with_one_cursor(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    iroot = str(tmp_path / "ice")
    lake.txn_write(_d(spark, 0, 10).coalesce(1), root)
    ice.iceberg_export_incremental(root, iroot)
    for k in range(1, 7):
        lake.txn_write(_d(spark, 100 * k, 100 * k + 3).coalesce(1), root)

    calls = []
    real = lake._replay

    def counting(r, v):
        calls.append(v)
        return real(r, v)

    monkeypatch.setattr(lake, "_replay", counting)
    ice.iceberg_export_incremental(root, iroot)
    # guards + the spec check replay O(1) times; the 6-version drain
    # itself advances ONE cursor (the old code replayed per version,
    # making this >= 6 on its own)
    assert len(calls) <= 4, calls
    monkeypatch.undo()
    assert _rows(ice.iceberg_read(spark, iroot)) == _rows(
        lake.txn_read(spark, root)
    )


# --- finding 4: malformed reader defaults quarantine --------------------


def test_malformed_reader_default_quarantines_not_crashes(tmp_path):
    writer = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "string"}]}
    p = str(tmp_path / "w.avro")
    av.write_avro([{"v": "x"}], writer, p)
    blob = open(p, "rb").read()
    # null default for a long: _default_value does int(None) ->
    # TypeError, which used to escape the (ValueError, KeyError) catch
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "v", "type": "string"},
            {"name": "extra", "type": "long", "default": None},
        ],
    }
    out = list(
        av.parse_avro_bytes(blob, reader_schema_json=json.dumps(reader))
    )
    assert len(out) == 1
    assert out[0]["corrupt_reason"].startswith("bad_schema")
    # a record default whose nested bytes field is malformed (bytes(
    # non-str) -> TypeError path)
    reader2 = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "v", "type": "string"},
            {"name": "sub", "default": {"b": 1.5},
             "type": {"type": "record", "name": "s",
                      "fields": [{"name": "b", "type": "bytes"}]}},
        ],
    }
    out = list(
        av.parse_avro_bytes(blob, reader_schema_json=json.dumps(reader2))
    )
    assert len(out) == 1
    assert out[0]["corrupt_reason"].startswith("bad_schema")


# --- finding 5: vectorized position-delete mask -------------------------


def test_iceberg_ds_mask_handles_dup_and_out_of_range_positions(
    spark, tmp_path
):
    """The numpy mask must drop exactly the in-range positions, with
    duplicate positions across delete files and positions past the
    file's row count tolerated (a foreign writer may emit either)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_cassandra_collabfiltering_spark.sources.iceberg_ds import (
        IcebergLogDataSource,
    )

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 20).coalesce(1), root)
    iroot = str(tmp_path / "ice")
    ice.iceberg_export(root, iroot)
    man1 = os.path.join(iroot, "metadata", "manifest-00000-data.avro")
    data_rel = [
        r
        for r in av.parse_avro_bytes(open(man1, "rb").read())
    ][0]["data_file"]["file_path"]

    def _pdel(name, positions):
        p = os.path.join(iroot, "data", name)
        pq.write_table(
            pa.table({
                "file_path": pa.array(
                    [data_rel] * len(positions), type=pa.string()
                ),
                "pos": pa.array(positions, type=pa.int64()),
            }),
            p,
        )
        return p

    # overlapping deletes (3 in both files) + one past-EOF position
    d1 = _pdel("pd1.parquet", [0, 3, 3, 5])
    d2 = _pdel("pd2.parquet", [3, 7, 10**6])
    mand = os.path.join(iroot, "metadata", "manifest-00008-del.avro")
    av.write_avro(
        [_entry(1, 1, d1, 4), _entry(1, 1, d2, 3)],
        ice._manifest_entry_schema(), mand,
    )
    mlist = os.path.join(iroot, "metadata", "snap-1-manifest-list.avro")
    av.write_avro(
        [_mlist_row(man1, 1), _mlist_row(mand, 1, content=1)],
        ice._MANIFEST_LIST_SCHEMA, mlist,
    )
    spark.dataSource.register(IcebergLogDataSource)
    got = spark.read.format("iceberglog").option("root", iroot).load()
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [i for i in range(20) if i not in (0, 3, 5, 7)]
