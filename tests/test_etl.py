"""ETL unit tests: S1 + P1 + P2 (SURVEY §2.1-2.2)."""

from __future__ import annotations

import pytest

from spark_cassandra_collabfiltering_spark.etl import tag_filter, to_rating_rows
from spark_cassandra_collabfiltering_spark.fixtures import write_ratings_csv
from spark_cassandra_collabfiltering_spark.sources import read_ratings_csv


@pytest.fixture(scope="module")
def raw(spark, tmp_path_factory):
    path = write_ratings_csv(str(tmp_path_factory.mktemp("csv") / "ratings.csv"))
    return read_ratings_csv(spark, path).cache()


def test_scan_schema(raw):
    assert [f.name for f in raw.schema.fields] == ["set", "user", "product", "rating"]
    assert raw.count() == 120


def test_tag_filter_split(raw):
    i, v = tag_filter(raw, "I"), tag_filter(raw, "V")
    assert i.count() == 111
    assert v.count() == 9
    assert i.filter("set <> 'I'").count() == 0


def test_rating_rows(raw):
    rows = to_rating_rows(tag_filter(raw, "V"))
    assert [f.name for f in rows.schema.fields] == ["id", "user", "product", "rating"]
    data = rows.collect()
    # uuid format + uniqueness (F9; value nondeterministic by design)
    ids = {r["id"] for r in data}
    assert len(ids) == 9 and all(len(i) == 36 for i in ids)
    assert all(1 <= r["user"] <= 20 and 1 <= r["product"] <= 6 for r in data)
    assert all(r["rating"] in (1.0, 2.0, 4.0, 5.0) for r in data)


def test_planted_structure(raw):
    # odd users' mean on products 1-3 must be high, 4-6 low (FIXTURES §1)
    from pyspark.sql import functions as F

    means = (
        raw.withColumn("odd", (F.col("user") % 2 == 1))
        .withColumn("lowhalf", (F.col("product") <= 3))
        .groupBy("odd", "lowhalf")
        .agg(F.avg("rating").alias("m"))
        .collect()
    )
    for r in means:
        expected_high = r["odd"] == r["lowhalf"]
        assert (r["m"] > 4.0) if expected_high else (r["m"] < 2.0)
