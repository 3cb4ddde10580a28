"""The txn lake as a native Spark data source (format("txnlake"),
Spark 4 Python DataSource API): batch reads with deletion vectors,
partition-value re-attachment and pushed-filter FILE pruning; a
distributed streaming source whose offsets are log versions; an Arrow
writer whose task/commit split maps onto the optimistic log protocol.
The data source is a protocol adapter over the same replay/commit
functions as lake.txn_* — both surfaces read one source of truth."""

import os
import tempfile

import pytest

from spark_cassandra_collabfiltering_spark.sources import lake
from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
    TxnLakeDataSource,
    TxnLakePushdownReader,
)


@pytest.fixture(scope="module")
def dspark(spark):
    spark.dataSource.register(TxnLakeDataSource)
    return spark


def _d(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_batch_read_applies_dvs_and_time_travels(dspark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _d(dspark, 0, 100).repartitionByRange(4, "id"), root,
        stats_cols=["id"],
    )
    lake.txn_delete_dv(
        dspark, root, dspark.range(0, 10).select("id"), ["id"]
    )
    got = dspark.read.format("txnlake").option("root", root).load()
    assert _ids(got) == list(range(10, 100))
    old = (
        dspark.read.format("txnlake")
        .option("root", root)
        .option("version", 0)
        .load()
    )
    assert old.count() == 100


def test_pushed_filters_prune_files_and_rows_stay_exact(dspark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    root = str(tmp_path / "t")
    lake.txn_write(
        _d(dspark, 0, 100).repartitionByRange(4, "id"), root,
        stats_cols=["id"],
    )
    r = TxnLakePushdownReader(root, None)
    r.pushFilters([GreaterThanOrEqual(("id",), 50), LessThanOrEqual(("id",), 60)])
    assert len(r.partitions()) < 4  # log-arithmetic file pruning
    got = dspark.read.format("txnlake").option("root", root).load()
    # ... while Spark still re-applies the filters row-exactly
    assert _ids(got.filter((F.col("id") >= 50) & (F.col("id") <= 60))) == list(
        range(50, 61)
    )


def test_partition_columns_reattach_with_types(dspark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    d = dspark.range(0, 60).select(
        "id", (F.col("id") % 3).cast("int").alias("p")
    )
    lake.txn_write(d, root, partition_by=["p"])
    got = dspark.read.format("txnlake").option("root", root).load()
    assert got.columns == ["id", "p"] and dict(got.dtypes)["p"] == "int"
    assert got.filter(got.p == got.id % 3).count() == 60
    assert got.filter("p = 1").count() == 20


def test_pre_evolution_files_surface_added_column_as_null(dspark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    lake.txn_write(dspark.range(3).select("id"), root)
    lake.txn_write(
        dspark.range(3, 5).select("id", F.lit("x").alias("tag")),
        root, merge_schema=True,
    )
    got = dspark.read.format("txnlake").option("root", root).load()
    rows = sorted(((r["id"], r["tag"]) for r in got.collect()), key=str)
    assert rows == [(0, None), (1, None), (2, None), (3, "x"), (4, "x")]


def test_writer_appends_with_stats_and_enforces_schema(dspark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    (
        _d(dspark, 0, 100)
        .repartitionByRange(4, "id")
        .write.format("txnlake")
        .option("root", root)
        .option("stats_cols", "id")
        .mode("append")
        .save()
    )
    _d(dspark, 100, 110).write.format("txnlake").option("root", root).mode(
        "append"
    ).save()
    assert lake.txn_read(dspark, root).count() == 110
    # task-computed add-file stats actually prune
    _, nread, ntotal = lake.txn_read_pruned(dspark, root, "id", 3, 4)
    assert nread < ntotal
    # append schema enforcement goes through the same _check_schema
    with pytest.raises(Exception, match="diverges|SchemaMismatch"):
        dspark.range(3).select(F.col("id").alias("zzz")).write.format(
            "txnlake"
        ).option("root", root).mode("append").save()
    # overwrite resets
    _d(dspark, 0, 7).write.format("txnlake").option("root", root).mode(
        "overwrite"
    ).save()
    assert lake.txn_read(dspark, root).count() == 7
    assert lake.txn_read(dspark, root, version=1).count() == 110


def test_writer_refuses_flat_append_to_partitioned_table(dspark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    d = dspark.range(9).select("id", (F.col("id") % 3).cast("int").alias("p"))
    lake.txn_write(d, root, partition_by=["p"])
    with pytest.raises(Exception, match="partitioned by"):
        d.write.format("txnlake").option("root", root).mode("append").save()


def test_streaming_source_pages_appends_exactly_once(dspark, tmp_path):
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    lake.txn_write(dspark.range(0, 5).select("id"), root)
    sdf = dspark.readStream.format("txnlake").option("root", root).load()

    def drain():
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out + "/data")
            .option("checkpointLocation", out + "/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert _ids(dspark.read.parquet(out + "/data")) == list(range(5))
    lake.txn_write(dspark.range(5, 9).select("id"), root)
    drain()
    # second drain emitted ONLY the gap commits (no duplicates)
    assert _ids(dspark.read.parquet(out + "/data")) == list(range(9))


def test_streaming_source_rejects_rewrites_unless_skipped(dspark, tmp_path):
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    lake.txn_write(
        _d(dspark, 0, 10).coalesce(1), root, stats_cols=["id"]
    )
    src = dspark.createDataFrame([(3, -1)], "id long, v long")
    lake.txn_merge(dspark, root, src, ["id"], stats_cols=["id"])
    sdf = dspark.readStream.format("txnlake").option("root", root).load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out + "/data")
        .option("checkpointLocation", out + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="APPEND-ONLY|skipChangeCommits"):
        q.awaitTermination(120)
        raise RuntimeError(q.exception() or "expected stream failure")
    # with skipChangeCommits the rewrite commit is silently skipped
    sdf2 = (
        dspark.readStream.format("txnlake")
        .option("root", root)
        .option("skipChangeCommits", "true")
        .load()
    )
    q2 = (
        sdf2.writeStream.format("parquet")
        .option("path", out + "/data2")
        .option("checkpointLocation", out + "/ck2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert _ids(dspark.read.parquet(out + "/data2")) == list(range(10))


def test_aborted_ds_write_leaves_only_vacuumable_garbage(dspark, tmp_path):
    # drive the writer PROTOCOL directly (tasks ran, commit never did —
    # the crash-between shape; the Spark-invoked path runs in a python
    # worker process, so the contract is pinned at the protocol level)
    import pyarrow as pa

    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeWriter,
    )

    root = str(tmp_path / "t")
    lake.txn_write(_d(dspark, 0, 5), root)
    w = TxnLakeWriter(
        root, _d(dspark, 0, 1).schema, overwrite=False, stats_cols=[]
    )
    msg = w.write(
        iter(pa.table({"id": [99], "v": [198]}).to_batches())
    )
    assert msg.files  # the task wrote its file...
    # ...but with no commit the table never sees it
    assert _ids(lake.txn_read(dspark, root)) == list(range(5))
    removed = lake.txn_vacuum(root)
    assert sorted(removed) == sorted(msg.files)
    assert _ids(lake.txn_read(dspark, root)) == list(range(5))
    # and a commit AFTER vacuum-of-garbage works normally
    msg2 = w.write(iter(pa.table({"id": [7], "v": [14]}).to_batches()))
    w.commit([msg2])
    assert _ids(lake.txn_read(dspark, root)) == [0, 1, 2, 3, 4, 7]


def test_stream_writer_appends_exactly_once(dspark, tmp_path):
    """df.writeStream.format('txnlake'): each micro-batch commits under
    the idempotent (txnApp, batchId) key — a batch replayed after a
    lost commit outcome (fresh checkpoint, same app) is a no-op, and
    its orphaned task files are vacuumable garbage."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    dspark.range(0, 5).select("id").coalesce(1).write.json(src + "/b1")
    sdf = dspark.readStream.schema("id long").json(src + "/*")

    def drain(stream, ckpt):
        q = (
            stream.writeStream.format("txnlake")
            .option("root", root)
            .option("txnApp", "t")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(sdf, ck)
    assert _ids(lake.txn_read(dspark, root)) == list(range(5))
    assert lake.txn_history(root)[0]["txn"] == ("t", 0)
    dspark.range(5, 9).select("id").coalesce(1).write.json(src + "/b2")
    drain(sdf, ck)
    assert _ids(lake.txn_read(dspark, root)) == list(range(9))
    # replay batch 0 with a FRESH checkpoint but the same txnApp: no-op
    drain(dspark.readStream.schema("id long").json(src + "/b1"), str(tmp_path / "ck2"))
    assert lake.txn_read(dspark, root).count() == 9
    assert lake.txn_vacuum(root)  # the replay's task files reclaimed
    assert lake.txn_read(dspark, root).count() == 9


def test_stream_writer_refuses_partitioned_tables(dspark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    d = dspark.range(6).select("id", (F.col("id") % 2).cast("int").alias("p"))
    lake.txn_write(d, root, partition_by=["p"])
    src = str(tmp_path / "src")
    d.coalesce(1).write.json(src)
    sdf = dspark.readStream.schema("id long, p int").json(src)
    q = (
        sdf.writeStream.format("txnlake")
        .option("root", root)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="partitioned"):
        q.awaitTermination(120)
        raise RuntimeError(q.exception() or "expected stream failure")


def test_catalog_tables_read_through_the_data_source(dspark, tmp_path):
    from pyspark.sql import functions as F

    cat = str(tmp_path / "cat")
    corpus = dspark.range(0, 8).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("x")
    )
    index = dspark.range(0, 8).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).alias("b")
    )
    lake.txn_multi_write(
        cat, {"corpus": corpus, "index": index},
        stats_cols={"corpus": ["doc_id"]},
    )
    lake.txn_multi_write(cat, {"corpus": corpus.filter("doc_id < 2")})
    got = (
        dspark.read.format("txnlake")
        .option("root", cat)
        .option("table", "corpus")
        .load()
    )
    assert got.count() == 10 and got.columns == ["doc_id", "x"]
    # version option pins the consistent cross-table snapshot
    v0 = (
        dspark.read.format("txnlake")
        .option("root", cat)
        .option("table", "corpus")
        .option("version", 0)
        .load()
    )
    assert v0.count() == 8
    idx = (
        dspark.read.format("txnlake")
        .option("root", cat)
        .option("table", "index")
        .load()
    )
    assert idx.count() == 8 and idx.columns == ["doc_id", "b"]
    with pytest.raises(Exception, match="unknown|empty"):
        dspark.read.format("txnlake").option("root", cat).option(
            "table", "nope"
        ).load().collect()


@pytest.mark.slow
def test_change_feed_stream_folds_to_the_table_state(dspark, tmp_path):
    """readChangeFeed mode: appends -> inserts, DV commits -> the
    newly-hidden rows as deletes, merges -> uncancelled churn,
    compaction -> nothing. The FOLD (v0 snapshot + inserts - deletes,
    multiset) must equal the final table — the same replay contract
    the batch txn_changes pins, carried through the streaming source."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    lake.txn_write(
        _d(dspark, 0, 20).repartitionByRange(2, "id"), root,
        stats_cols=["id"],
    )  # v0
    lake.txn_write(_d(dspark, 20, 25).coalesce(1), root, stats_cols=["id"])  # v1
    lake.txn_delete_dv(
        dspark, root, dspark.range(0, 4).select("id"), ["id"]
    )  # v2
    src = dspark.createDataFrame([(5, -5), (100, 200)], "id long, v long")
    lake.txn_merge(dspark, root, src, ["id"], stats_cols=["id"])  # v3
    lake.txn_compact(dspark, root, stats_cols=["id"])  # v4: silent
    sdf = (
        dspark.readStream.format("txnlake")
        .option("root", root)
        .option("readChangeFeed", "true")
        .load()
    )
    assert "_change_type" in sdf.columns and "_commit_version" in sdf.columns
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out + "/data")
        .option("checkpointLocation", out + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    feed = dspark.read.parquet(out + "/data")
    assert feed.filter("_commit_version = 4").count() == 0  # compact silent
    # DV version emits exactly the newly-hidden rows
    dv_rows = feed.filter("_commit_version = 2").collect()
    assert sorted(r["id"] for r in dv_rows) == [0, 1, 2, 3]
    assert all(r["_change_type"] == "delete" for r in dv_rows)
    # fold: changes SINCE v0 applied to the v0 snapshot == final table
    base = lake.txn_read(dspark, root, version=0).select("id", "v")
    ins = feed.filter(
        "_change_type = 'insert' AND _commit_version >= 1"
    ).select("id", "v")
    dels = feed.filter(
        "_change_type = 'delete' AND _commit_version >= 1"
    ).select("id", "v")
    folded = sorted(
        (r["id"], r["v"])
        for r in base.unionByName(ins).exceptAll(dels).collect()
    )
    want = sorted(
        (r["id"], r["v"]) for r in lake.txn_read(dspark, root).collect()
    )
    assert folded == want
