"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on sf0.001 (smoke check).
- ``queries()``: every implemented operator from SURVEY §2 + the
  mandated extensions, as (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted only for
  genuinely non-SQL-expressible ops — ALS, mapInPandas decode — which
  get the weaker rows-only check).

Implementation lives in spark_cassandra_collabfiltering_spark/plans/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import spark_cassandra_collabfiltering_spark.plans.queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's validate() pipeline shape (scan →
    composite-key join → squared error → RMSE, SURVEY §3.2) on the
    FIXTURES §4 ratings analog at sf0.001."""
    return _q.QUERIES["a3_rmse_item_mean"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
