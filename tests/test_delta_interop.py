"""Read-only Delta Lake interop (r8, VERDICT r7 'What's missing' #2):
``delta_read`` replays a real ``_delta_log`` — newline-delimited JSON
action commits, optional parquet checkpoint + ``_last_checkpoint``,
partition values, column mapping name mode — per the public Delta
protocol spec (delta-io/delta PROTOCOL.md). ``delta_export`` is the
fixture generator / migration path out of the native txn lake; the
round-trip pins here prove the two logs agree version for version.
A hand-written log (as another engine would produce it) pins the
reader against exporter quirks."""

import json
import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import lake
from spark_cassandra_collabfiltering_spark.sources import delta_interop as di


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _history(spark, tmp_path):
    """append, append, compact, merge — the rewrite-heavy shape."""
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 200).coalesce(2), root, stats_cols=["id"])
    lake.txn_write(_d(spark, 200, 300).coalesce(1), root, stats_cols=["id"])
    lake.txn_compact(spark, root, sort_cols=["id"], n_files=2,
                     stats_cols=["id"])
    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(0, -1), (5000, 1)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    return root


def test_history_export_round_trips_every_version(spark, tmp_path):
    root = _history(spark, tmp_path)
    droot = str(tmp_path / "delta")
    last = di.delta_export(root, droot)
    assert last == lake.txn_latest_version(root)
    for v in range(last + 1):
        assert _rows(di.delta_read(spark, droot, v)) == _rows(
            lake.txn_read(spark, root, v)
        ), f"divergence at version {v}"


def test_metadata_count_matches_scan(spark, tmp_path):
    root = _history(spark, tmp_path)
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    assert di.delta_count(droot) == lake.txn_count(root)


def test_checkpoint_seeds_replay_after_log_truncation(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(5):
        lake.txn_write(_d(spark, i * 10, (i + 1) * 10).coalesce(1), root)
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot, checkpoint_every=2)
    expect = _rows(lake.txn_read(spark, root))
    # Delta allows deleting JSON commits at or below a checkpoint
    # (metadata retention); the reader must seed from the checkpoint
    cp = di._last_checkpoint(droot)
    assert cp is not None and cp["version"] >= 2
    for v in range(int(cp["version"]) + 1):
        os.remove(di._commit_path(droot, v))
    assert _rows(di.delta_read(spark, droot)) == expect
    # ... and a read BELOW the truncation refuses loudly
    with pytest.raises(FileNotFoundError):
        di.delta_read(spark, droot, 0)


def test_partition_values_reattach_typed(spark, tmp_path):
    root = str(tmp_path / "t")
    d = spark.range(0, 60).select(
        "id", (F.col("id") % 3).cast("int").alias("bucket"),
        (F.col("id") * 7).alias("v"),
    )
    lake.txn_write(d.repartition(2), root, partition_by=["bucket"])
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    got = di.delta_read(spark, droot)
    assert dict(got.dtypes)["bucket"] == "int"
    assert _rows(got) == _rows(lake.txn_read(spark, root))


def test_column_mapping_renames_and_protocol(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 30).coalesce(1), root)
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "v", "speed")
    lake.txn_write(
        spark.range(30, 40).select("id", (F.col("id") * 2).alias("speed")),
        root,
    )
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    got = di.delta_read(spark, droot)
    assert set(got.columns) == {"id", "speed"}
    assert _rows(got) == _rows(lake.txn_read(spark, root))
    # the exported log carries the columnMapping reader bump
    st, _ = di._replay_delta(droot, None)
    assert int(st.protocol["minReaderVersion"]) == 2
    assert st.meta["configuration"]["delta.columnMapping.mode"] == "name"


def test_dv_history_exports_as_roaring_and_reads_back(spark, tmp_path):
    """Native RLE deletion vectors export as REAL Delta RoaringBitmap
    sidecars: history mode writes the remove+re-add-with-DV pair per
    dv commit, every version still round-trips, and metadata COUNT(*)
    subtracts cardinality."""
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 100).coalesce(2), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 7).select("id"), ["id"])
    lake.txn_delete_dv(spark, root,
                       spark.range(50, 55).select("id"), ["id"])  # composes
    lake.txn_write(_d(spark, 200, 210).coalesce(1), root,
                   stats_cols=["id"])
    droot = str(tmp_path / "delta")
    last = di.delta_export(root, droot)
    for v in range(last + 1):
        assert _rows(di.delta_read(spark, droot, v)) == _rows(
            lake.txn_read(spark, root, v)
        ), f"divergence at version {v}"
    assert di.delta_count(droot) == lake.txn_count(root) == 98
    # the exported protocol declares the feature
    st, _ = di._replay_delta(droot, None)
    assert "deletionVectors" in st.protocol["readerFeatures"]
    # snapshot mode attaches descriptors to the live adds
    droot2 = str(tmp_path / "delta2")
    di.delta_export(root, droot2, snapshot=True)
    assert _rows(di.delta_read(spark, droot2)) == _rows(
        lake.txn_read(spark, root)
    )
    assert di.delta_count(droot2) == 98


def test_dv_survives_checkpoint_seeding(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 50).coalesce(1), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 5).select("id"), ["id"])
    lake.txn_write(_d(spark, 100, 110).coalesce(1), root)
    lake.txn_write(_d(spark, 110, 120).coalesce(1), root)
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot, checkpoint_every=2)
    cp = di._last_checkpoint(droot)
    assert cp is not None
    for v in range(int(cp["version"]) + 1):
        os.remove(di._commit_path(droot, v))
    # the checkpoint alone must preserve the DV descriptor — a lost
    # one would silently resurrect the 5 deleted rows
    assert sorted(r[0] for r in di.delta_read(spark, droot).collect()) == (
        list(range(5, 50)) + list(range(100, 120))
    )
    assert di.delta_count(droot) == 65


def test_unconverged_widening_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        spark.range(0, 20).select(F.col("id").cast("int").alias("id")),
        root,
    )
    lake.txn_widen_column(root, "id", "long")
    lake.txn_write(spark.range(5_000_000_000, 5_000_000_005), root)
    with pytest.raises(ValueError, match="typeWidening|physical types"):
        di.delta_export(root, str(tmp_path / "delta"))
    lake.txn_compact(spark, root)  # converges storage to long
    droot = str(tmp_path / "delta_ok")
    di.delta_export(root, droot, snapshot=True)
    assert _rows(di.delta_read(spark, droot)) == _rows(
        lake.txn_read(spark, root)
    )


def test_reader_handles_a_foreign_hand_written_log(spark, tmp_path):
    """A _delta_log as ANOTHER engine would write it (no exporter in
    the loop): plain spark parquet files, hand-authored JSON actions
    including a remove, schema evolution and a commitInfo-only
    commit."""
    root = str(tmp_path / "ext")
    os.makedirs(os.path.join(root, "_delta_log"))

    def _write_part(df, name):
        tmpd = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(tmpd)
        src = next(
            f for f in os.listdir(tmpd) if f.endswith(".parquet")
        )
        os.replace(os.path.join(tmpd, src), os.path.join(root, name))
        return name

    p0 = _write_part(_d(spark, 0, 10), "part-0.parquet")
    p1 = _write_part(_d(spark, 10, 20), "part-1.parquet")
    p2 = _write_part(
        spark.range(20, 25).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("tag")
        ),
        "part-2.parquet",
    )
    schema_v0 = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    schema_v2 = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "tag", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })

    def commit(v, actions):
        with open(di._commit_path(root, v), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    commit(0, [
        {"commitInfo": {"operation": "WRITE", "engineInfo": "other-engine"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "abc", "format": {"provider": "parquet",
                                              "options": {}},
                      "schemaString": schema_v0, "partitionColumns": [],
                      "configuration": {}, "createdTime": 1}},
        {"add": {"path": p0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "stats": "{\"numRecords\":10}"}},
        {"add": {"path": p1, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True,
                 "stats": "{\"numRecords\":10}"}},
    ])
    commit(1, [
        {"remove": {"path": p0, "deletionTimestamp": 2, "dataChange": True}},
    ])
    commit(2, [
        {"metaData": {"id": "abc", "format": {"provider": "parquet",
                                              "options": {}},
                      "schemaString": schema_v2, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": p2, "partitionValues": {}, "size": 1,
                 "modificationTime": 3, "dataChange": True,
                 "stats": "{\"numRecords\":5}"}},
    ])
    commit(3, [{"commitInfo": {"operation": "OPTIMIZE"}}])

    got = di.delta_read(spark, root)  # latest: v1 dropped, tag added
    assert set(got.columns) == {"id", "v", "tag"}
    by_id = {r["id"]: (r["v"], r["tag"]) for r in got.collect()}
    assert sorted(by_id) == list(range(10, 25))
    assert by_id[10] == (20, None)  # pre-evolution file: typed NULL
    assert by_id[20] == (40, "x")
    assert di.delta_count(root) == 15
    # time travel to v0 sees both original files, no tag column
    v0 = di.delta_read(spark, root, 0)
    assert set(v0.columns) == {"id", "v"}
    assert sorted(r["id"] for r in v0.collect()) == list(range(20))


def test_unknown_reader_features_refused(spark, tmp_path):
    root = str(tmp_path / "ext")
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(di._commit_path(root, 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
        }}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": []}),
            "partitionColumns": [], "configuration": {},
        }}) + "\n")
    with pytest.raises(lake.UnsupportedProtocol, match="typeWidening"):
        di.delta_read(spark, root)


def test_foreign_inline_dv_applies(spark, tmp_path):
    """An inline ('i' storageType) deletion vector hand-authored into
    a foreign log — no exporter in the loop — hides exactly its
    positions."""
    from spark_cassandra_collabfiltering_spark.sources import delta_dv

    root = str(tmp_path / "ext")
    os.makedirs(os.path.join(root, "_delta_log"))
    tmpd = str(tmp_path / "stage")
    _d(spark, 0, 20).coalesce(1).write.parquet(tmpd)
    src = next(f for f in os.listdir(tmpd) if f.endswith(".parquet"))
    os.replace(os.path.join(tmpd, src), os.path.join(root, "p.parquet"))
    desc = delta_dv.make_descriptor_inline([0, 3, 17])
    with open(di._commit_path(root, 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "long", "nullable": True,
                 "metadata": {}}]}),
            "partitionColumns": [], "configuration": {},
        }}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "p.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True,
            "stats": "{\"numRecords\":20}",
            "deletionVector": desc,
        }}) + "\n")
    got = sorted(r["id"] for r in di.delta_read(spark, root).collect())
    assert got == [i for i in range(20) if i not in (0, 3, 17)]
    assert di.delta_count(root) == 17


# --------------------------------------------------------------------
# format("deltalog") — the interop as a native Spark data source
# --------------------------------------------------------------------


@pytest.fixture(scope="module")
def dlspark(spark):
    from spark_cassandra_collabfiltering_spark.sources.deltalog_ds import (
        DeltaLogDataSource,
    )

    spark.dataSource.register(DeltaLogDataSource)
    return spark


def test_ds_read_matches_delta_read_with_dvs_and_time_travel(
    dlspark, tmp_path
):
    root = str(tmp_path / "t")
    lake.txn_write(_d(dlspark, 0, 100).coalesce(2), root, stats_cols=["id"])
    lake.txn_delete_dv(dlspark, root,
                       dlspark.range(0, 9).select("id"), ["id"])
    lake.txn_write(_d(dlspark, 200, 210).coalesce(1), root,
                   stats_cols=["id"])
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    got = dlspark.read.format("deltalog").option("root", droot).load()
    assert _rows(got) == _rows(lake.txn_read(dlspark, root))
    v0 = (dlspark.read.format("deltalog").option("root", droot)
          .option("version", 0).load())
    assert v0.count() == 100


def test_ds_pushdown_prunes_files_and_partitions(dlspark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from spark_cassandra_collabfiltering_spark.sources.deltalog_ds import (
        DeltaLogPushdownReader,
    )

    root = str(tmp_path / "t")
    d = dlspark.range(0, 90).select(
        "id", (F.col("id") % 3).cast("int").alias("bucket"),
    )
    lake.txn_write(d.repartition(2), root, partition_by=["bucket"],
                   stats_cols=["id"])
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    r = DeltaLogPushdownReader(droot, None)
    total = len(r.partitions())
    r.pushFilters([EqualTo(("bucket",), 1)])
    assert 0 < len(r.partitions()) < total  # partition-value pruning
    r2 = DeltaLogPushdownReader(droot, None)
    r2.pushFilters([GreaterThanOrEqual(("id",), 10**9)])
    assert len(r2.partitions()) == 0  # min/max stats pruning
    # rows stay exact through Spark's own re-applied filter
    got = (dlspark.read.format("deltalog").option("root", droot).load()
           .filter(F.col("bucket") == 1))
    assert sorted(x["id"] for x in got.collect()) == [
        i for i in range(90) if i % 3 == 1
    ]


def test_ds_mapped_table_reads_logical_names(dlspark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(dlspark, 0, 30).coalesce(1), root)
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "v", "speed")
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    got = dlspark.read.format("deltalog").option("root", droot).load()
    assert set(got.columns) == {"id", "speed"}
    assert _rows(got) == _rows(lake.txn_read(dlspark, root))


def test_ds_is_read_only(dlspark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(dlspark, 0, 5).coalesce(1), root)
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    with pytest.raises(Exception, match="read-only"):
        (_d(dlspark, 0, 5).write.format("deltalog")
         .option("root", droot).mode("append").save())


def test_ds_streaming_source_appends_and_change_commit_contract(
    dlspark, tmp_path
):
    """readStream.format('deltalog'): version offsets, append-only
    micro-batches, the Delta change-commit refusal, and
    skipChangeCommits."""
    import time

    root = str(tmp_path / "t")
    lake.txn_write(_d(dlspark, 0, 30).coalesce(1), root)
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (dlspark.readStream.format("deltalog").option("root", droot)
         .load()
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(
        r["id"] for r in dlspark.read.parquet(out).collect()
    ) == list(range(30))

    # a second Delta commit appears (append): the stream picks up
    # exactly the new rows from the stored offset
    lake.txn_write(_d(dlspark, 100, 110).coalesce(1), root)
    droot2 = str(tmp_path / "delta2")
    di.delta_export(root, droot2)
    # continue the SAME checkpoint against the two-commit log
    q2 = (dlspark.readStream.format("deltalog").option("root", droot2)
          .load()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got = sorted(r["id"] for r in dlspark.read.parquet(out).collect())
    assert got == list(range(30)) + list(range(100, 110))

    # a data-changing rewrite (DV re-add) must fail the stream unless
    # skipChangeCommits
    lake.txn_delete_dv(dlspark, root,
                       dlspark.range(0, 3).select("id"), ["id"])
    droot3 = str(tmp_path / "delta3")
    di.delta_export(root, droot3)
    from spark_cassandra_collabfiltering_spark.sources.deltalog_ds import (
        DeltaLogStreamReader,
    )

    r = DeltaLogStreamReader(droot3, skip_change_commits=False)
    with pytest.raises(ValueError, match="skipChangeCommits"):
        r.partitions({"version": 1}, {"version": 2})
    r2 = DeltaLogStreamReader(droot3, skip_change_commits=True)
    assert r2.partitions({"version": 1}, {"version": 2}) == []


def test_table_properties_export_and_surface(spark, tmp_path):
    """CHECK constraints and generation expressions travel to the
    Delta log in the spec's property shapes (delta.constraints.* in
    the configuration, delta.generationExpression per field) and
    delta_properties surfaces them for a migration in."""
    root = str(tmp_path / "t")
    d = spark.range(1, 40).select(
        "id", (F.col("id") % 7).alias("bucket"), (F.col("id") * 2).alias("v")
    )
    lake.txn_write(d.coalesce(1), root, generated={"bucket": "id % 7"})
    lake.txn_set_constraint(root, "v_pos", "v > 0")
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    props = di.delta_properties(droot)
    assert props["constraints"] == {"v_pos": "v > 0"}
    assert props["generated"] == {"bucket": "id % 7"}
    # rows still round-trip
    assert _rows(di.delta_read(spark, droot)) == _rows(
        lake.txn_read(spark, root)
    )


def test_delta_import_round_trips_rows_and_properties(spark, tmp_path):
    root = str(tmp_path / "t")
    d = spark.range(1, 60).select(
        "id", (F.col("id") % 7).alias("bucket"), (F.col("id") * 2).alias("v")
    )
    lake.txn_write(d.coalesce(2), root, generated={"bucket": "id % 7"})
    lake.txn_set_constraint(root, "v_pos", "v > 0")
    lake.txn_delete_dv(spark, root, spark.range(1, 5).select("id"), ["id"])
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot, snapshot=True)
    back = str(tmp_path / "back")
    di.delta_import(spark, droot, back, stats_cols=["id"])
    assert _rows(lake.txn_read(spark, back)) == _rows(
        lake.txn_read(spark, root)
    )
    # properties re-applied: the imported table ENFORCES them
    assert lake.txn_constraints(back) == {"v_pos": "v > 0"}
    with pytest.raises(lake.ConstraintViolation):
        lake.txn_write(
            spark.createDataFrame([(100, 2, -1)],
                                  "id long, bucket long, v long"),
            back,
        )
    with pytest.raises(lake.GeneratedColumnViolation):
        lake.txn_write(
            spark.createDataFrame([(100, 3, 5)],
                                  "id long, bucket long, v long"),
            back,
        )


def test_incremental_export_drains_exactly_once(spark, tmp_path):
    """delta_export_incremental: the continuous migration-out path.
    Drain 1 full-exports; later drains append ONLY the new txn
    commits; a repeated drain with nothing new is a byte-level no-op
    (the txn stamps in the Delta log are the exactly-once key — same
    contract shape as txn_cdc_sink's (app, epoch))."""
    root = str(tmp_path / "t")
    droot = str(tmp_path / "delta")
    lake.txn_write(_d(spark, 0, 40).coalesce(2), root, stats_cols=["id"])

    v1 = di.delta_export_incremental(root, droot)
    assert v1 == 0 and di.delta_latest_version(droot) == 0
    assert _rows(di.delta_read(spark, droot)) == _rows(
        lake.txn_read(spark, root)
    )

    # nothing new -> no-op, log untouched
    log_bytes = open(di._commit_path(droot, 0), "rb").read()
    assert di.delta_export_incremental(root, droot) == 0
    assert open(di._commit_path(droot, 0), "rb").read() == log_bytes

    # two more txn commits: append + a DV delete (which also forces a
    # PROTOCOL UPGRADE — the original export had no DV feature)
    lake.txn_write(_d(spark, 100, 120).coalesce(1), root)
    lake.txn_delete_dv(
        spark, root, spark.range(0, 7).select("id"), ["id"]
    )
    v2 = di.delta_export_incremental(root, droot)
    assert v2 == 2 and di.delta_latest_version(droot) == 2
    assert _rows(di.delta_read(spark, droot)) == _rows(
        lake.txn_read(spark, root)
    )
    # version-for-version time travel still holds across the seam
    for v in (0, 1, 2):
        assert _rows(di.delta_read(spark, droot, version=v)) == _rows(
            lake.txn_read(spark, root, version=v)
        )
    # the upgrade action landed in the first NEW commit
    acts = [json.loads(line) for line in open(di._commit_path(droot, 1))]
    protos = [a["protocol"] for a in acts if a.get("protocol")]
    assert protos and "deletionVectors" in protos[0]["readerFeatures"]

    # drain again immediately (the crash-retry shape): no-op
    assert di.delta_export_incremental(root, droot) == 2

    # a third batch drains on top of the resumed state
    lake.txn_write(_d(spark, 200, 205).coalesce(1), root)
    assert di.delta_export_incremental(root, droot) == 3
    assert _rows(di.delta_read(spark, droot)) == _rows(
        lake.txn_read(spark, root)
    )


def test_incremental_export_resumes_overwrite_and_compact(spark, tmp_path):
    """Operations that REMOVE prior files must resolve their rel paths
    across the drain seam (the rebuilt txn-file -> exported-path map):
    an overwrite and a compaction landed AFTER the first drain remove
    the files the first drain exported."""
    root = str(tmp_path / "t")
    droot = str(tmp_path / "delta")
    lake.txn_write(_d(spark, 0, 30).coalesce(3), root, stats_cols=["id"])
    di.delta_export_incremental(root, droot)
    lake.txn_write(_d(spark, 50, 60).coalesce(2), root)  # v1
    lake.txn_compact(spark, root)                        # v2: removes all
    lake.txn_write(_d(spark, 70, 75).coalesce(1), root,  # v3: overwrite
                   mode="overwrite")
    di.delta_export_incremental(root, droot)
    assert _rows(di.delta_read(spark, droot)) == _rows(
        lake.txn_read(spark, root)
    )
    for v in (1, 2, 3):
        assert _rows(di.delta_read(spark, droot, version=v)) == _rows(
            lake.txn_read(spark, root, version=v)
        )
    # the foreign-log adoption refusal is loud
    alien = str(tmp_path / "alien")
    di.delta_export(root, alien, snapshot=True)
    with pytest.raises(ValueError, match="txn stamps"):
        di.delta_export_incremental(root, alien)


def test_continuous_delta_to_lake_migration_composes(dlspark, tmp_path):
    """Migration-IN, continuously (r9): readStream.format('deltalog')
    -> writeStream.format('txnlake') live-syncs a growing foreign
    Delta table into a native txn-lake table — version offsets on the
    source side, the idempotent (txnApp, batchId) key on the sink
    side, so BOTH ends are exactly-once and a re-run drain lands
    nothing. The source Delta log grows IN PLACE via
    delta_export_incremental between drains (a real Delta writer's
    shape)."""
    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeDataSource,
    )

    dlspark.dataSource.register(TxnLakeDataSource)
    src = str(tmp_path / "src")          # the native table feeding delta
    droot = str(tmp_path / "delta")      # the foreign Delta table
    dst = str(tmp_path / "dst")          # the migration target lake
    ck = str(tmp_path / "ck")

    lake.txn_write(_d(dlspark, 0, 40).coalesce(1), src)
    di.delta_export_incremental(src, droot)

    def drain():
        q = (dlspark.readStream.format("deltalog").option("root", droot)
             .load()
             .writeStream.format("txnlake")
             .option("root", dst)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    assert sorted(
        r["id"] for r in lake.txn_read(dlspark, dst).collect()
    ) == list(range(40))

    # the foreign table grows by one commit; the next drain syncs
    # exactly the delta
    lake.txn_write(_d(dlspark, 100, 115).coalesce(1), src)
    di.delta_export_incremental(src, droot)
    drain()
    got = sorted(r["id"] for r in lake.txn_read(dlspark, dst).collect())
    assert got == list(range(40)) + list(range(100, 115))

    # idempotent re-drain: no new txn-lake version, no duplicate rows
    v_before = lake.txn_latest_version(dst)
    drain()
    assert lake.txn_latest_version(dst) == v_before
    assert sorted(
        r["id"] for r in lake.txn_read(dlspark, dst).collect()
    ) == got
