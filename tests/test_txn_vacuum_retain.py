"""Retention VACUUM on the transactional lake (the Delta VACUUM ...
RETAIN shape): ``txn_vacuum_retain(root, keep_from)`` reclaims the
data files referenced ONLY by versions below the horizon — the
storage-lifecycle piece without which a long-lived table grows
forever (every compaction/merge keeps its pre-images alive for time
travel). The horizon marker lands FIRST (atomic rename), so a crash
mid-delete leaves readers refusing loudly, never tripping over
missing files; the boundary commit's pre-images are kept so
txn_changes(horizon, ...) still reconstructs its churn; the log is
never touched (lineage and txn_history survive)."""

import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import lake


def _d(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def _history(spark, tmp_path):
    """v0 append, v1 append, v2 compact (v0/v1 files die), v3 merge
    (rewrites), v4 append."""
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 500).coalesce(2), root, stats_cols=["id"])
    lake.txn_write(_d(spark, 1000, 1500).coalesce(2), root,
                   stats_cols=["id"])
    lake.txn_compact(spark, root, sort_cols=["id"], n_files=2,
                     stats_cols=["id"])
    lake.txn_merge(
        spark, root,
        spark.createDataFrame([(0, -1), (9000, 1)], "id long, v long"),
        ["id"], stats_cols=["id"],
    )
    lake.txn_write(_d(spark, 2000, 2010), root)
    return root


def test_retain_reclaims_dead_files_and_keeps_reads_green(spark, tmp_path):
    root = _history(spark, tmp_path)
    n_before = sum(
        len(fs) for _, _, fs in os.walk(os.path.join(root, "_data"))
    )
    removed = lake.txn_vacuum_retain(root, 3)
    assert removed  # compaction/merge pre-images reclaimed
    n_after = sum(
        len(fs) for _, _, fs in os.walk(os.path.join(root, "_data"))
    )
    assert n_after < n_before
    # everything at or above the horizon is untouched
    assert lake.txn_read(spark, root).count() == 1011
    assert lake.txn_read(spark, root, version=3).count() == 1001
    assert lake.txn_count(root) == 1011


def test_reads_below_horizon_refuse_loudly(spark, tmp_path):
    root = _history(spark, tmp_path)
    lake.txn_vacuum_retain(root, 3)
    for fn in (
        lambda: lake.txn_read(spark, root, version=1),
        lambda: lake.txn_read_pruned(spark, root, "id", 0, 5, version=2),
        lambda: lake.txn_count(root, 0),
        lambda: lake.txn_restore(root, 2),
        lambda: lake.txn_changes(spark, root, 0),
    ):
        with pytest.raises(ValueError, match="vacuum horizon"):
            fn()
    # the log itself survives for lineage
    assert len(lake.txn_history(root)) == 5


def test_cdf_from_the_horizon_still_reconstructs(spark, tmp_path):
    # the boundary commit (a merge at v3) reads its REMOVES at v-1 —
    # retain must keep those pre-images even though v2 is below the
    # horizon
    root = _history(spark, tmp_path)
    lake.txn_vacuum_retain(root, 3)
    ch = lake.txn_changes(spark, root, 3).collect()
    ins = {r["id"] for r in ch if r["_change_type"] == "insert"}
    dele = {r["id"] for r in ch if r["_change_type"] == "delete"}
    assert 9000 in ins and 0 in ins and 0 in dele  # update = del + ins
    assert {2000, 2009} <= ins  # the v4 append


def test_horizon_is_monotone_and_detail_unaffected(spark, tmp_path):
    root = _history(spark, tmp_path)
    lake.txn_vacuum_retain(root, 3)
    assert lake._vacuum_horizon(root) == 3
    lake.txn_vacuum_retain(root, 1)  # clamped up, never moves back
    assert lake._vacuum_horizon(root) == 3
    lake.txn_vacuum_retain(root, 4)
    assert lake._vacuum_horizon(root) == 4
    assert lake.txn_detail(root)["num_rows"] == 1011


def test_retain_keeps_active_dv_sidecars(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, 0, 500).coalesce(2), root, stats_cols=["id"])
    lake.txn_delete_dv(spark, root, spark.range(0, 10).select("id"),
                       ["id"])  # v1: sidecar targets v0 files
    lake.txn_write(_d(spark, 1000, 1010), root)  # v2
    lake.txn_vacuum_retain(root, 2)
    # the DV (committed at v1, below the horizon) is still ACTIVE at
    # v2 — its sidecar and target files must survive
    assert lake.txn_read(spark, root).count() == 500
    assert lake.txn_count(root) == 500


def test_data_source_respects_the_horizon(spark, tmp_path):
    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeDataSource,
    )

    spark.dataSource.register(TxnLakeDataSource)
    root = _history(spark, tmp_path)
    lake.txn_vacuum_retain(root, 3)
    with pytest.raises(Exception, match="horizon"):
        (
            spark.read.format("txnlake")
            .option("root", root).option("version", "1")
            .load().collect()
        )
    got = (
        spark.read.format("txnlake").option("root", root).load()
    )
    assert got.count() == 1011


def test_plain_vacuum_composes_with_retain(spark, tmp_path):
    # txn_vacuum after retain must not delete the boundary pre-images
    # retain kept (CDF at the horizon still works), and still removes
    # never-committed garbage
    root = _history(spark, tmp_path)
    lake.txn_vacuum_retain(root, 3)
    junk = os.path.join(root, "_data", "junk", "orphan.parquet")
    os.makedirs(os.path.dirname(junk), exist_ok=True)
    open(junk, "wb").write(b"PAR1junkPAR1")
    removed = lake.txn_vacuum(root)
    assert junk in removed
    ch = lake.txn_changes(spark, root, 3)
    assert ch.count() > 0
