"""Pure-SQL surface: every testdata table queryable via spark.sql,
with results identical to the DataFrame path."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table
from spark_cassandra_collabfiltering_spark.sources import register_testdata_views

from conftest import SF_SMOKE


def test_all_views_register_and_scan(spark):
    names = register_testdata_views(spark, SF_SMOKE)
    assert len(names) == 10
    for name in names:
        assert spark.sql(f"SELECT count(*) AS n FROM {name}").first()["n"] > 0


def test_sql_equals_dataframe_path(spark):
    register_testdata_views(spark, SF_SMOKE)
    sql = spark.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s, count(*) AS n
           FROM lineitem GROUP BY 1"""
    )
    df = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_events_view_has_normalized_ts(spark):
    register_testdata_views(spark, SF_SMOKE)
    row = spark.sql("SELECT ts FROM events LIMIT 1").schema["ts"]
    assert row.dataType.typeName() == "timestamp"
