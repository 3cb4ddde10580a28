"""S2-S5: table scans, bulk-write sinks, truncate lifecycle (SURVEY §2.1).

The reference's storage layer is Cassandra via the DataStax connector
(scan: CollabFilterCassandra8.java:33; write:
CollabFilterCassandraDriver.java:100-103; truncate: :71-76 with DDL in
src/sql/collab_filter_setup.sql). Storage here is a thin strategy
interface with two backends:

- :class:`ParquetStorage` — the default and the one tests/bench use;
  datasets are directories of parquet under a root path. At 100 TB this
  is the lake layout Spark is optimized for (splittable columnar files,
  partition pruning, vectorized scan).
- :class:`CassandraStorage` — same semantics through the
  spark-cassandra-connector DataSource (format
  ``org.apache.spark.sql.cassandra``). Constructed lazily; the connector
  jar and a live cluster are NOT present in this environment, so the
  class raises a clear error at use, not import.

Both give DataFrames, so every downstream operator is backend-agnostic
and Catalyst pushes filters/pruning into either scan.
"""

from __future__ import annotations

import os
import shutil
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one driver-provided testdata parquet table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view so the whole corpus
    is queryable through the SQL entry point (``spark.sql``) — the
    same Catalyst plans as the DataFrame API, pure-SQL surface. The
    events view applies the engine's canonical nanos→micros timestamp
    normalization, so SQL users see the same ``ts`` the DataFrame
    queries do."""
    from spark_cassandra_collabfiltering_spark.plans.queries import t

    for name in TESTDATA_TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TESTDATA_TABLES)


class Storage(ABC):
    """Pluggable table store: full-scan read, bulk append, truncate."""

    @abstractmethod
    def read(self, spark: SparkSession, table: str) -> DataFrame: ...

    @abstractmethod
    def write(self, df: DataFrame, table: str, mode: str = "append") -> None: ...

    @abstractmethod
    def truncate(self, spark: SparkSession, table: str) -> None: ...


class ParquetStorage(Storage):
    """Parquet-backed tables under ``root`` (one directory per table)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._path(table))

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        df.write.mode(mode).parquet(self._path(table))

    def truncate(self, spark: SparkSession, table: str) -> None:
        # TRUNCATE ks.tbl analog (CollabFilterCassandraDriver.java:82-84):
        # drop the table's files; a subsequent read sees an empty table
        # only after a fresh write, so callers pair truncate with write.
        path = self._path(table)
        if os.path.exists(path):
            shutil.rmtree(path)

    def exists(self, table: str) -> bool:
        return os.path.exists(self._path(table))


class CassandraStorage(Storage):
    """Cassandra tables via the spark-cassandra-connector DataSource.

    Mirrors the reference's keyspace/table addressing
    (RatingDO.java:6-9 constants; scans at CollabFilterCassandra8.java:33).
    Requires the connector package on the Spark classpath, e.g.
    ``spark.jars.packages=com.datastax.spark:spark-cassandra-connector_2.13:3.5.1``
    and ``spark.cassandra.connection.host`` set — neither is available in
    this offline environment, so use ParquetStorage for tests.
    """

    FORMAT = "org.apache.spark.sql.cassandra"

    def __init__(self, keyspace: str = "employerratings"):
        self.keyspace = keyspace

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return (
            spark.read.format(self.FORMAT)
            .options(keyspace=self.keyspace, table=table)
            .load()
        )

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        (
            df.write.format(self.FORMAT)
            .options(keyspace=self.keyspace, table=table)
            .mode(mode)
            .save()
        )

    def truncate(self, spark: SparkSession, table: str) -> None:
        # The reference truncates through a raw CQL session
        # (CollabFilterCassandraDriver.java:71-76). Without a driver-side
        # CQL client in this environment, route DDL through the connector's
        # catalog if configured.
        spark.sql(f"TRUNCATE TABLE {self.keyspace}.{table}")
