"""JSONL source/sink: schema'd splittable reads, corrupt-record
quarantine (never a silent drop, never a job abort), shard-layout
writes, and a round-trip through the documents table."""

from __future__ import annotations

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_cassandra_collabfiltering_spark.sources import (  # noqa: E402
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_corrupt_lines_are_quarantined_not_dropped(spark, tmp_path):
    src = str(tmp_path / "in" / "part-000.jsonl")
    _write_lines(
        src,
        [
            '{"doc_id": 1, "text": "good one"}',
            "{not json at all",
            '{"doc_id": 2, "text": "also good"}',
            '["wrong", "shape"]',
        ],
    )
    df = read_jsonl(spark, src, DOC_SCHEMA)
    clean, bad = split_corrupt(df)
    assert {(r["doc_id"], r["text"]) for r in clean.collect()} == {
        (1, "good one"),
        (2, "also good"),
    }
    quarantined = {r["_corrupt_record"] for r in bad.collect()}
    assert "{not json at all" in quarantined
    assert len(quarantined) == 2  # exhaustive: every input line accounted for
    assert "_corrupt_record" not in clean.columns


def test_roundtrip_documents_table(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    out = str(tmp_path / "shards")
    write_jsonl(docs, out, compression="gzip", max_records_per_file=100)
    back, bad = split_corrupt(read_jsonl(spark, out, DOC_SCHEMA))
    assert bad.count() == 0
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # shard layout honoured: gzip'd files, each <= 100 records
    files = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert files
    for f in files:
        with gzip.open(f, "rt") as fh:
            assert sum(1 for _ in fh) <= 100


def test_reader_keeps_user_corrupt_col_if_present(spark, tmp_path):
    src = str(tmp_path / "in2" / "x.jsonl")
    _write_lines(src, ['{"doc_id": 5, "text": "t"}'])
    schema_with = StructType(
        list(DOC_SCHEMA.fields)
        + [StructField("_corrupt_record", StringType(), True)]
    )
    df = read_jsonl(spark, src, schema_with)
    assert df.columns.count("_corrupt_record") == 1


def test_read_is_splittable_shape(spark, tmp_path):
    # multiLine=false is what keeps JSONL splittable; assert the scan
    # carries the documented options rather than re-deriving them
    src = str(tmp_path / "in3" / "x.jsonl")
    _write_lines(src, ['{"doc_id": 9, "text": "z"}'])
    df = read_jsonl(spark, src, DOC_SCHEMA)
    clean, _ = split_corrupt(df)
    row = clean.filter(F.col("doc_id") == 9).collect()
    assert row and row[0]["text"] == "z"
