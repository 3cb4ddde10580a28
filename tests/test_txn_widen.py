"""Type widening on the transactional lake (the Delta type-widening
shape): ALTER COLUMN TYPE to a strictly wider type as a METADATA-ONLY
commit. Old files keep their narrow physical type; reads group files
by their recorded write schema and CAST each group to the table type
(mergeSchema alone would fail outright on int-vs-long footers), so
values are exact by construction — the whitelist admits only lossless
upcasts. Narrow writers keep working via implicit upcast; compaction
converges storage to the wide type."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_cassandra_collabfiltering_spark.sources import lake


def _narrow(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 2).cast("int").alias("v"),
    )


def _widened(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _narrow(spark, 0, 100).repartitionByRange(2, "id"), root,
        stats_cols=["id"],
    )
    lake.txn_widen_column(root, "v", "long")
    return root


def test_widen_is_metadata_only_and_values_exact(spark, tmp_path):
    root = _widened(spark, tmp_path)
    v = lake.txn_latest_version(root)
    assert lake._read_commit(root, v)["files"] == []
    got = lake.txn_read(spark, root)
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.agg(F.sum("v")).collect()[0][0] == 9900
    # idempotent re-widen commits nothing new... (same type -> same
    # schema carried forward, harmless meta commit)
    lake.txn_widen_column(root, "v", "long")
    assert lake.txn_read(spark, root).count() == 100


def test_wide_values_land_and_narrow_writers_keep_working(spark, tmp_path):
    root = _widened(spark, tmp_path)
    # the point of widening: a value that does not fit the old type
    lake.txn_write(
        spark.createDataFrame([(2000, 2 ** 40)], "id int, v long"), root,
        stats_cols=["id"],
    )
    # a writer still producing the narrow type upcasts implicitly
    lake.txn_write(
        spark.createDataFrame([(1000, 7)], "id int, v int"), root
    )
    got = lake.txn_read(spark, root)
    assert got.count() == 102
    assert got.agg(F.max("v")).collect()[0][0] == 2 ** 40
    vals = {r["id"]: r["v"] for r in got.filter("id >= 1000").collect()}
    assert vals == {1000: 7, 2000: 2 ** 40}


def test_pruning_merge_dv_count_across_mixed_types(spark, tmp_path):
    root = _widened(spark, tmp_path)
    lake.txn_write(
        spark.createDataFrame([(2000, 2 ** 40)], "id int, v long"), root,
        stats_cols=["id"],
    )
    _, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 0, 10)
    assert nread < ntotal
    # merge with a NARROW source upcasts and prunes
    vm, rewrote, total = lake.txn_merge(
        spark, root,
        spark.createDataFrame([(0, 99)], "id int, v int"), ["id"],
        stats_cols=["id"],
    )
    assert rewrote < total
    assert lake.txn_read(spark, root).filter("id = 0").collect()[0]["v"] == 99
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    assert lake.txn_count(root) == 100 == lake.txn_read(spark, root).count()


def test_compact_converges_storage_to_the_wide_type(spark, tmp_path):
    root = _widened(spark, tmp_path)
    v = lake.txn_compact(spark, root, sort_cols=["id"], stats_cols=["id"])
    newf = lake._read_commit(root, v)["files"]
    raw = spark.read.parquet(*newf)
    assert dict(raw.dtypes)["v"] == "bigint"  # physically wide now
    assert lake.txn_read(spark, root).agg(F.sum("v")).collect()[0][0] == 9900


def test_widen_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(
        _narrow(spark, 0, 10).withColumn("p", F.col("id") % 2), root,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="only lossless"):
        lake.txn_widen_column(root, "v", "short")  # narrowing
    with pytest.raises(ValueError, match="partition column"):
        lake.txn_widen_column(root, "p", "long")
    with pytest.raises(ValueError, match="unknown widen target"):
        lake.txn_widen_column(root, "v", "string")
    lake.txn_set_constraint(root, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        lake.txn_widen_column(root, "v", "long")


def test_widen_composes_with_column_mapping(spark, tmp_path):
    root = _widened(spark, tmp_path)
    lake.txn_enable_column_mapping(root)
    lake.txn_rename_column(root, "v", "value")
    lake.txn_widen_column(root, "id", "long")
    got = lake.txn_read(spark, root)
    assert dict(got.dtypes) == {"id": "bigint", "value": "bigint"}
    assert got.agg(F.sum("value")).collect()[0][0] == 9900
    _, nread, ntotal = lake.txn_read_pruned(spark, root, "id", 0, 10)
    assert nread < ntotal


def test_widen_on_partitioned_table_nonpartition_column(spark, tmp_path):
    # widening a NON-partition column of a partitioned table: the
    # grouped read path must still re-attach partition values
    root = str(tmp_path / "t")
    lake.txn_write(
        _narrow(spark, 0, 20).withColumn(
            "p", (F.col("id") % 2).cast("int")
        ),
        root,
        partition_by=["p"], stats_cols=["id"],
    )
    lake.txn_widen_column(root, "v", "long")
    lake.txn_write(
        spark.createDataFrame(
            [(500, 2 ** 40, 1)], "id int, v long, p int"
        ),
        root,
    )
    got = lake.txn_read(spark, root)
    assert got.count() == 21
    assert got.agg(F.max("v")).collect()[0][0] == 2 ** 40
    df, nread, ntotal = lake.txn_read_partitioned(spark, root, {"p": 1})
    assert nread < ntotal
    assert {r["p"] for r in df.collect()} == {1}


def test_cdf_and_time_travel_across_a_widen(spark, tmp_path):
    root = _widened(spark, tmp_path)
    lake.txn_write(
        spark.createDataFrame([(2000, 2 ** 40)], "id int, v long"), root
    )
    # time travel below the widen shows the narrow vocabulary
    old = lake.txn_read(spark, root, version=0)
    assert dict(old.dtypes)["v"] == "int"
    ch = lake.txn_changes(spark, root, 0)
    assert ch.filter("_commit_version = 1").count() == 0  # meta: silent
    ins = ch.filter("_change_type = 'insert'")
    assert ins.count() == 101
    assert ins.agg(F.max("v")).collect()[0][0] == 2 ** 40


def test_dv_delete_and_cdf_spanning_narrow_and_wide_files(spark, tmp_path):
    # a tombstone batch whose victims span the widen boundary: the
    # position scan (and the CDF reconstruction of that commit) must
    # group per write schema — one mergeSchema scan over int-vs-long
    # footers fails outright
    root = _widened(spark, tmp_path)  # narrow files, v widened
    lake.txn_write(
        spark.createDataFrame(
            [(2000, 2 ** 40), (2001, 5)], "id int, v long"
        ),
        root,
        stats_cols=["id"],
    )
    v, n_del, n_cand = lake.txn_delete_dv(
        spark, root,
        spark.createDataFrame([(1,), (2000,)], "id int"), ["id"],
    )
    assert n_del == 2 and n_cand >= 2  # hit both sides of the widen
    got = lake.txn_read(spark, root)
    ids = {r["id"] for r in got.collect()}
    assert 1 not in ids and 2000 not in ids and 2001 in ids
    assert lake.txn_count(root) == 100
    # CDF of the dv commit reconstructs both deletes, range-end types
    ch = lake.txn_changes(spark, root, v, v).collect()
    assert {(r["id"], r["_change_type"]) for r in ch} == {
        (1, "delete"), (2000, "delete")
    }
    assert {r["v"] for r in ch} == {2, 2 ** 40}
