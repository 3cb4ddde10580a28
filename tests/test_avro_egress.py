"""Distributed Avro egress under a TARGET writer schema (r10 — the
write twin of r9's reader-side resolution): alias matching, default
fill, lossless promotions, loud refusals (narrowing, unconsumed
columns, missing defaults), per-partition container files, and the
encode->decode round trip through the independent reader."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import avro_source as av


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


V2 = {
    "type": "record", "name": "order",
    "fields": [
        # int source column widens to long
        {"name": "key", "type": "long", "aliases": ["okey"]},
        # straight name match
        {"name": "who", "type": ["null", "string"]},
        # no source column: filled from the default
        {"name": "tier", "type": "string", "default": "STANDARD"},
    ],
}


def test_egress_resolves_alias_promotion_and_default(spark, tmp_path):
    df = spark.range(0, 500).select(
        F.col("id").cast("int").alias("okey"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("c"), F.col("id"))).alias("who"),
    ).repartition(3)
    out = str(tmp_path / "out")
    n = av.avro_write(df, out, json.dumps(V2))
    assert n == 500
    files = glob.glob(os.path.join(out, "*.avro"))
    assert len(files) == 3  # one container per non-empty partition
    back = av.read_avro(spark, out)
    clean, bad = av.split_corrupt(back)
    assert bad.count() == 0
    d = dict(clean.dtypes)
    assert (d["key"], d["who"], d["tier"]) == ("bigint", "string",
                                               "string")
    got = {(r["key"], r["who"], r["tier"]) for r in clean.collect()}
    want = {
        (i, None if i % 7 == 0 else f"c{i}", "STANDARD")
        for i in range(500)
    }
    assert got == want


def test_egress_refusals_are_loud(spark, tmp_path):
    df = spark.range(0, 5).select(
        F.col("id").alias("key"), F.lit("x").alias("who")
    )
    # narrowing (long column -> int field) refuses
    t1 = {"type": "record", "name": "r", "fields": [
        {"name": "key", "type": "int"},
        {"name": "who", "type": "string"},
    ]}
    with pytest.raises(ValueError, match="widen"):
        av.avro_write(df, str(tmp_path / "a"), json.dumps(t1))
    # an unconsumed frame column refuses (no silent data drop)
    t2 = {"type": "record", "name": "r", "fields": [
        {"name": "key", "type": "long"},
    ]}
    with pytest.raises(ValueError, match="who"):
        av.avro_write(df, str(tmp_path / "b"), json.dumps(t2))
    # a target field with neither source column nor default refuses
    t3 = {"type": "record", "name": "r", "fields": [
        {"name": "key", "type": "long"},
        {"name": "who", "type": "string"},
        {"name": "extra", "type": "long"},
    ]}
    with pytest.raises(ValueError, match="no default"):
        av.avro_write(df, str(tmp_path / "c"), json.dumps(t3))
    # a directory that already holds containers refuses (retry
    # appends would double rows)
    t4 = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "key", "type": "long"},
            {"name": "who", "type": "string"},
        ],
    })
    out = str(tmp_path / "d")
    av.avro_write(df, out, t4)
    with pytest.raises(FileExistsError):
        av.avro_write(df, out, t4)


def test_egress_logical_types_round_trip(spark, tmp_path):
    target = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "d", "type": {"type": "int",
                                   "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "amt", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 12, "scale": 2}},
        ],
    }
    df = spark.range(0, 50).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
                   ).alias("d"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        (F.col("id") / 4).cast("decimal(12,2)").alias("amt"),
    ).coalesce(1)
    out = str(tmp_path / "out")
    assert av.avro_write(df, out, json.dumps(target)) == 50
    clean, bad = av.split_corrupt(av.read_avro(spark, out))
    assert bad.count() == 0
    assert _rows(clean.select("d", "ts", "amt")) == _rows(df)


def test_egress_deflate_and_evolved_read_twin(spark, tmp_path):
    """Files written under the evolved schema read uniformly WITHOUT
    reader-side resolution, and a reader still on the OLD schema can
    resolve them back (the two resolution directions compose)."""
    df = spark.range(0, 200).select(
        F.col("id").cast("int").alias("okey"),
        F.concat(F.lit("c"), F.col("id")).alias("who"),
    ).repartition(2)
    out = str(tmp_path / "out")
    av.avro_write(df, out, json.dumps(V2), codec="deflate")
    # old-schema reader: key long matches; tier discarded as a
    # writer-only field; okey recovered via the READER alias
    old = {
        "type": "record", "name": "order",
        "fields": [
            {"name": "okey", "type": "long", "aliases": ["key"]},
            {"name": "who", "type": ["null", "string"]},
        ],
    }
    clean, bad = av.split_corrupt(
        av.read_avro(spark, out, reader_schema_json=json.dumps(old))
    )
    assert bad.count() == 0
    assert _rows(clean.select("okey", "who")) == _rows(
        df.select(F.col("okey").cast("long"), "who")
    )
