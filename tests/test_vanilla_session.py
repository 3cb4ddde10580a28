"""Session-portability pins (VERDICT r8 'What's wrong' #1): a query's
correctness must never depend on who built the SparkSession. The r8
driver ran the window through a VANILLA session — no repo defaults —
and ``format("txnlake")`` crashed at plan time because its reader
implemented ``pushFilters()`` while Spark 4's
``spark.sql.python.filterPushdown.enabled`` was false.

These tests flip the gating conf OFF on the live session (the exact
failing mode: the conf is read at plan time per query, so flipping it
runtime-simulates a vanilla session faithfully) and pin that:

- the portable default readers load and answer exactly with pushdown
  DISABLED, for both ``format("txnlake")`` (single-table + catalog +
  streaming) and ``format("deltalog")``;
- ``register_txnlake`` / ``register_deltalog`` re-enable the conf and
  swap in the pushdown-default variants, restoring plan-time file
  pruning without any caller-visible change;
- ``.option("pushdown", ...)`` overrides either registration default.
"""

from __future__ import annotations

import pytest

from spark_cassandra_collabfiltering_spark.sources import lake
from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
    TxnLakeDataSource,
    register_txnlake,
)

_CONF = "spark.sql.python.filterPushdown.enabled"


@pytest.fixture()
def vanilla(spark):
    """The live session with the pushdown conf forced to the vanilla
    default (false) for the test body, restored after."""
    before = spark.conf.get(_CONF)
    spark.conf.set(_CONF, "false")
    yield spark
    spark.conf.set(_CONF, before)


def _table(spark, tmp_path, n=100):
    root = str(tmp_path / "t")
    df = spark.range(0, n).selectExpr("id", "id * 2 as v")
    lake.txn_write(df.repartitionByRange(4, "id"), root, stats_cols=["id"])
    return root


def test_txnlake_reads_with_pushdown_conf_off(vanilla, tmp_path):
    root = _table(vanilla, tmp_path)
    vanilla.dataSource.register(TxnLakeDataSource)
    got = (
        vanilla.read.format("txnlake")
        .option("root", root)
        .load()
        .where("id >= 50 and id <= 60")
    )
    assert sorted(r["id"] for r in got.collect()) == list(range(50, 61))


def test_txnlake_catalog_reads_with_pushdown_conf_off(vanilla, tmp_path):
    cat = str(tmp_path / "cat")
    a = vanilla.range(0, 10).selectExpr("id")
    b = vanilla.range(10, 30).selectExpr("id")
    lake.txn_multi_write(cat, {"a": a, "b": b})
    vanilla.dataSource.register(TxnLakeDataSource)
    got = (
        vanilla.read.format("txnlake")
        .option("root", cat)
        .option("table", "b")
        .load()
    )
    assert got.count() == 20


def test_txnlake_stream_source_with_pushdown_conf_off(vanilla, tmp_path):
    root = _table(vanilla, tmp_path, n=10)
    vanilla.dataSource.register(TxnLakeDataSource)
    sdf = vanilla.readStream.format("txnlake").option("root", root).load()
    q = (
        sdf.writeStream.format("memory")
        .queryName("vanilla_txn_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert vanilla.sql("select * from vanilla_txn_stream").count() == 10


def test_register_txnlake_enables_pushdown_and_prunes(spark, tmp_path):
    root = _table(spark, tmp_path)
    assert register_txnlake(spark) is True
    assert spark.conf.get(_CONF) == "true"
    got = (
        spark.read.format("txnlake")
        .option("root", root)
        .load()
        .where("id >= 50 and id <= 60")
    )
    assert sorted(r["id"] for r in got.collect()) == list(range(50, 61))
    # and the pushdown-default variant still honors an explicit off
    off = (
        spark.read.format("txnlake")
        .option("root", root)
        .option("pushdown", "false")
        .load()
        .where("id < 5")
    )
    assert off.count() == 5


def test_register_txnlake_registers_portable_variant_when_conf_stuck(
    spark, monkeypatch, tmp_path
):
    """If the conf cannot be enabled (locked/overridden), registration
    must fall back to the portable class — never a plan-time crash."""
    registered = []
    real_set = type(spark.conf).set  # unbound original

    def deny(self, key, value=None):
        if key == _CONF:
            raise RuntimeError("locked conf")
        return real_set(self, key, value)

    before = spark.conf.get(_CONF)
    real_set(spark.conf, _CONF, "false")
    try:
        monkeypatch.setattr(
            type(spark.dataSource),
            "register",
            lambda self, cls: registered.append(cls),
        )
        monkeypatch.setattr(type(spark.conf), "set", deny)
        assert register_txnlake(spark) is False
        assert registered == [TxnLakeDataSource]
    finally:
        monkeypatch.undo()
        real_set(spark.conf, _CONF, before)


def test_deltalog_reads_with_pushdown_conf_off(vanilla, tmp_path):
    from spark_cassandra_collabfiltering_spark.sources import delta_interop as di
    from spark_cassandra_collabfiltering_spark.sources.deltalog_ds import (
        DeltaLogDataSource,
        register_deltalog,
    )

    root = _table(vanilla, tmp_path)
    droot = str(tmp_path / "delta")
    di.delta_export(root, droot)
    vanilla.dataSource.register(DeltaLogDataSource)
    got = (
        vanilla.read.format("deltalog")
        .option("root", droot)
        .load()
        .where("id >= 90")
    )
    assert got.count() == 10
    # flipping registration back on restores pruning without changing rows
    vanilla.conf.set(_CONF, "true")
    assert register_deltalog(vanilla) is True
    got2 = (
        vanilla.read.format("deltalog")
        .option("root", droot)
        .load()
        .where("id >= 90")
    )
    assert got2.count() == 10


def test_driver_window_queries_run_on_vanilla_confs(spark, tmp_path):
    """The r9 regression net for the whole failure class: the queries
    the lake family exposes through the driver window must PLAN under
    vanilla confs. (The full 240-query vanilla oracle sweep lives in
    scripts/check_oracle.py --vanilla; here we pin the one family that
    actually broke, end to end through its registry builder.)"""
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    before = spark.conf.get(_CONF)
    spark.conf.set(_CONF, "false")
    try:
        df = QUERIES["lake_txn_datasource"].builder(
            spark, "/root/testdata/sf0.001"
        )
        assert df.count() > 0
    finally:
        spark.conf.set(_CONF, before)
