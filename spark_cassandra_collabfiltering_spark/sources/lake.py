"""Lake-layout writers/readers beyond the plain parquet directory:
partitioned datasets, bucketed tables, JSON lines.

Scale rationale (the 100 TB story):

- **Partitioned writes** (`partitionBy`) give partition PRUNING: a
  filter on the partition column skips whole directories at plan time.
  The right partition key is low-cardinality and filter-aligned (dates,
  regions) — never a high-cardinality id (millions of tiny files).
- **Bucketed tables** (`bucketBy` + `saveAsTable`) pre-shuffle the data
  ONCE at write time: two tables bucketed on the same key into the same
  bucket count join with NO exchange on either side — the shuffle is
  amortized into the layout. This is the batch analog of co-located
  storage; `assert_no_shuffle_join` in tests proves the plan.
- **JSONL** is the interchange format for document pipelines; always
  read with an explicit schema (schema inference is a full extra scan
  and types drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write a parquet dataset partitioned by ``partition_cols``
    (hive-style key=value directories; filters on those columns prune
    at the source)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table
    in the session catalog. Joins/aggregations on ``bucket_cols``
    between tables with identical bucketing need no shuffle; with
    ``sort_cols`` the sort side of a sort-merge join is free too.
    ``path`` makes it an external table at that location (the session
    warehouse dir is a static conf, fixed at JVM start)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """One JSON object per line (the document-pipeline interchange
    format). Compression/partitioning compose like any file sink.
    Default mode is Spark's fail-fast ``"error"`` — a corpus sink must
    not silently wipe existing shards on path reuse; overwrite is an
    explicit opt-in."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema'd JSONL scan. The explicit schema keeps the read a single
    pass (no inference scan) and pins types; corrupt lines surface in
    ``_corrupt_record`` under the default PERMISSIVE mode."""
    return spark.read.schema(schema).json(path)
