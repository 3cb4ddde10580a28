"""CHECK constraints on the transactional lake (Delta's ALTER TABLE
ADD CONSTRAINT shape): metadata-only commits that gate every
subsequent write at the boundary — bad rows raise BEFORE any data
lands, instead of being discovered by a downstream scan. SQL CHECK
semantics: NULL passes, only FALSE violates."""

import pytest

from spark_cassandra_collabfiltering_spark.sources import lake


def _d(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_constraint_gates_appends_and_leaves_no_garbage(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10), (2, 20)]), root)
    v = lake.txn_set_constraint(root, "v_positive", "v > 0")
    assert lake.txn_history(root)[0]["op"] == "meta"
    assert lake.txn_constraints(root) == {"v_positive": "v > 0"}
    # good rows pass
    lake.txn_write(_d(spark, [(3, 30)]), root)
    # bad rows raise BEFORE the data write: nothing to vacuum
    with pytest.raises(lake.ConstraintViolation, match="v_positive"):
        lake.txn_write(_d(spark, [(4, -1)]), root)
    assert lake.txn_vacuum(root) == []
    assert _ids(lake.txn_read(spark, root)) == [1, 2, 3]
    # overwrites are gated too (constraints are table properties)
    with pytest.raises(lake.ConstraintViolation):
        lake.txn_write(_d(spark, [(9, 0)]), root, mode="overwrite")


def test_null_passes_check_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10)]), root)
    lake.txn_set_constraint(root, "v_positive", "v > 0")
    lake.txn_write(
        spark.createDataFrame([(2, None)], "id long, v long"), root
    )  # NULL satisfies CHECK — the SQL standard contract
    assert lake.txn_read(spark, root).count() == 2


def test_constraint_gates_merge_sources(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10), (2, 20)]), root, stats_cols=["id"])
    lake.txn_set_constraint(root, "v_positive", "v > 0")
    with pytest.raises(lake.ConstraintViolation):
        lake.txn_merge(
            spark, root, _d(spark, [(1, -5)]), ["id"], stats_cols=["id"]
        )
    # keys-only tombstone deletes carry no new data: never gated
    v, n, _ = lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    assert n == 1


def test_drop_constraint_and_unknown_name(spark, tmp_path):
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10)]), root)
    lake.txn_set_constraint(root, "v_positive", "v > 0")
    with pytest.raises(ValueError, match="no CHECK constraint"):
        lake.txn_drop_constraint(root, "nope")
    lake.txn_drop_constraint(root, "v_positive")
    assert lake.txn_constraints(root) == {}
    lake.txn_write(_d(spark, [(2, -1)]), root)  # gate removed
    assert lake.txn_read(spark, root).count() == 2


def test_constraints_survive_checkpoints(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10)]), root)
    lake.txn_set_constraint(root, "v_positive", "v > 0")
    for i in range(2, 6):  # drive past a checkpoint
        lake.txn_write(_d(spark, [(i, i)]), root)
    assert lake.txn_constraints(root) == {"v_positive": "v > 0"}
    with pytest.raises(lake.ConstraintViolation):
        lake.txn_write(_d(spark, [(99, -1)]), root)


def test_concurrent_constraint_changes_conflict(spark, tmp_path, monkeypatch):
    import os as _os

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10)]), root)
    orig_open = _os.open
    stolen = {"done": False}

    def stealing_open(path, flags, *a, **k):
        if "_log" in path and path.endswith("1.json") and not stolen["done"]:
            stolen["done"] = True
            lake.txn_set_constraint(root, "other", "id >= 0")
        return orig_open(path, flags, *a, **k)

    monkeypatch.setattr(_os, "open", stealing_open)
    with pytest.raises(
        lake.ConcurrentWriteConflict, match="constraint change"
    ):
        lake.txn_set_constraint(root, "v_positive", "v > 0")
    monkeypatch.setattr(_os, "open", orig_open)
    assert lake.txn_constraints(root) == {"other": "id >= 0"}
    # appends rebase past meta commits freely
    orig_open2 = _os.open
    stolen2 = {"done": False}

    def stealing_open2(path, flags, *a, **k):
        if "_log" in path and path.endswith("2.json") and not stolen2["done"]:
            stolen2["done"] = True
            lake.txn_set_constraint(root, "v_positive", "v > 0")
        return orig_open2(path, flags, *a, **k)

    monkeypatch.setattr(_os, "open", stealing_open2)
    lake.txn_write(_d(spark, [(2, 20)]), root)
    monkeypatch.setattr(_os, "open", orig_open2)
    assert lake.txn_read(spark, root).count() == 2


def test_data_source_writers_refuse_constrained_tables(spark, tmp_path):
    from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
        TxnLakeDataSource,
    )

    spark.dataSource.register(TxnLakeDataSource)
    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10)]), root)
    lake.txn_set_constraint(root, "v_positive", "v > 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        _d(spark, [(2, 20)]).write.format("txnlake").option(
            "root", root
        ).mode("append").save()


def test_protocol_versioning_refuses_newer_logs(spark, tmp_path):
    """Commits record their protocol; a reader must refuse a log
    written under a NEWER protocol instead of misreading state
    (silently ignoring unknown commit semantics corrupts replay).
    Pre-versioning commits (no field) stay readable as protocol 1."""
    import json
    import os as _os

    root = str(tmp_path / "t")
    lake.txn_write(_d(spark, [(1, 10)]), root)
    # commits carry the current protocol
    assert lake._read_commit(root, 0)["protocol"] == lake.PROTOCOL_VERSION
    assert lake.txn_detail(root)["protocol"] == lake.PROTOCOL_VERSION
    # a pre-versioning commit (field stripped) reads fine
    p = _os.path.join(root, "_log", f"{0:020d}.json")
    c = json.load(open(p))
    del c["protocol"]
    json.dump(c, open(p, "w"))
    assert lake.txn_read(spark, root).count() == 1
    # a FUTURE protocol refuses loudly (beyond the HIGHEST supported —
    # CM_PROTOCOL logs are readable since column mapping landed)
    c["protocol"] = lake.MAX_READER_PROTOCOL + 1
    json.dump(c, open(p, "w"))
    with pytest.raises(lake.UnsupportedProtocol, match="protocol"):
        lake.txn_read(spark, root).count()


def test_txn_detail_summarizes_the_table(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    d = spark.range(20).select(
        "id", (F.col("id") % 2).cast("int").alias("p"), (F.col("id") * 2).alias("v")
    )
    lake.txn_write(d, root, partition_by=["p"], stats_cols=["id"])
    lake.txn_set_constraint(root, "v_nonneg", "v >= 0")
    lake.txn_delete_dv(
        spark, root, spark.createDataFrame([(3,)], "id long"), ["id"]
    )
    det = lake.txn_detail(root)
    assert det["version"] == 2
    assert det["partition_by"] == ["p"]
    assert det["columns"] == ["id", "p", "v"]
    assert det["num_active_dvs"] == 1
    assert det["constraints"] == {"v_nonneg": "v >= 0"}
    assert det["num_files"] >= 2 and det["size_bytes"] > 0
