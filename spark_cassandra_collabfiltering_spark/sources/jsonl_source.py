"""JSONL source/sink — the interchange format LLM data pipelines
actually exchange (one JSON document per line, usually gzip'd shards).

No reference counterpart (the reference's only file source is the
ratings CSV, CollabFilterCassandraDriver.java:95-96); this is
mandated-extension territory: a 100 TB pretraining corpus arrives as
millions of JSONL shard files, and the ingest rules are always the
same three:

- ALWAYS pass an explicit schema. ``inferSchema`` on JSON is a full
  extra pass over the data — at corpus scale that is a second 100 TB
  scan before the first real one.
- PERMISSIVE mode + a corrupt-record column. Web-scale JSONL is never
  fully clean; a malformed line must become a quarantine row, not a
  job abort (FAILFAST) or a silent drop (DROPMALFORMED).
- Line-delimited, not multiLine: single-line records are what makes
  JSON splittable — Spark can split a shard at newline boundaries
  across tasks. ``multiLine=true`` forces one task per FILE.

The writer mirrors the common shard layout: optional compression and
a bounded records-per-file knob so downstream loaders see uniformly
sized shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def jsonl_schema_with_corrupt(schema: StructType) -> StructType:
    """The user's schema plus the corrupt-record capture column (Spark
    only populates ``columnNameOfCorruptRecord`` if the column is
    present in the read schema)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Schema'd, splittable, quarantine-capturing JSONL scan.

    Every row comes back: well-formed lines with their typed columns
    and ``_corrupt_record`` NULL; malformed lines with data columns
    NULL and the raw line preserved in ``_corrupt_record``. Split with
    :func:`split_corrupt` — don't silently drop.

    Implementation is text-scan + ``from_json`` rather than the JSON
    DataSource: Spark's native reader refuses any plan whose pruned
    projection references ONLY the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    documented workaround is caching the whole parse), and the
    quarantine side of :func:`split_corrupt` is exactly that plan.
    Parsing per line with from_json is the same Jackson code path,
    stays splittable, and keeps the raw line a real column with no
    cache."""
    full = jsonl_schema_with_corrupt(schema)
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j"),
    )
    data_cols = [
        F.col(f"j.{f.name}").alias(f.name)
        for f in full.fields
        if f.name != CORRUPT_COL
    ]
    # a line from_json cannot even begin to parse yields a NULL struct;
    # fold that into the same quarantine contract as a partial parse
    corrupt = F.when(F.col("j").isNull(), F.col("value")).otherwise(
        F.col(f"j.{CORRUPT_COL}")
    )
    return parsed.select(*data_cols, corrupt.alias(CORRUPT_COL))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantine rows with the
    raw line only). Disjoint and exhaustive: a row is quarantined iff
    Spark populated the corrupt column."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    max_records_per_file: int | None = None,
    mode: str = "error",
) -> None:
    """Shard-layout JSONL write: one line per record, optional codec,
    optional per-file record bound (uniform shards for downstream
    loaders; files stay independently readable).

    ``mode`` defaults to Spark's own ``"error"`` (fail fast if the
    target path exists): a corpus-scale sink must never silently wipe
    existing shards on an accidental path reuse — overwriting is an
    explicit opt-in (``mode="overwrite"``)."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.json(path)
