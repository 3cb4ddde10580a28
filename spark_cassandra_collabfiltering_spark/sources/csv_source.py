"""S1: CSV source (SURVEY §2.1).

The reference reads the ratings CSV as untyped text lines and does
client-side prefix filtering + positional split/parse
(CollabFilterCassandraDriver.java:95-96,110-134). Spark-first, the file
is read once through the schema'd CSV DataSource, so the tag predicate
and column pruning push into the scan and parsing is JVM-side
(no per-line Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_cassandra_collabfiltering_spark.schemas import RAW_CSV_SCHEMA


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd scan of the raw ratings CSV; generator columns pruned.

    Returns columns ``set, user, product, rating`` — the tag filter
    (P1) and uuid attachment (P2) live in :mod:`..etl` so one scan can
    feed both the training and validation splits.
    """
    return (
        spark.read.schema(RAW_CSV_SCHEMA)
        .option("header", "false")
        .option("mode", "PERMISSIVE")
        .csv(path)
        .select("set", "user", "product", "rating")
    )
