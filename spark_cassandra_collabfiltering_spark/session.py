"""SparkSession factory.

The reference builds a ``SparkConf`` with ``master=local[4]`` and a
Cassandra host, then a ``JavaSparkContext``
(reference: CollabFilterCassandraDriver.java:25-26,50-54). Here the
session is the modern ``SparkSession`` with scale-oriented defaults:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- Arrow on (vectorized Python interchange for the few Pandas UDF paths)
- shuffle partitions sized to the local parallelism instead of the
  200 default (on a real cluster this is set per-deploy; AQE coalesces)

All knobs are plain Spark configs so the same code runs unchanged on a
1000-executor cluster — only ``master`` and sizing configs change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))


def get_spark(
    app_name: str = "spark_cassandra_collabfiltering_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    cassandra_host: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cassandra_host`` mirrors the reference's
    ``spark.cassandra.connection.host`` conf
    (CollabFilterCassandraDriver.java:26); it is only applied when given,
    since the connector is an optional backend (tests use parquet).
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or max(DEFAULT_CPUS * 2, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # -Xss16m: deep Java deserialization chains (Scala collection
        # proxies inside ALS task closures) intermittently overflow the
        # default thread stack — seen as whole-suite Py4J failures with
        # a hundreds-deep ObjectInputStream trace. A bigger stack is
        # the deterministic fix (same flag a cluster deploy would set).
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp -Xss16m")
        .config("spark.executor.extraJavaOptions", "-Xss16m")
    )
    if cassandra_host:
        builder = builder.config("spark.cassandra.connection.host", cassandra_host)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
