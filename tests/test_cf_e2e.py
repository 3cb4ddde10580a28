"""Reference contract e2e (SURVEY §3.3, §5.3-1).

Mirrors CollabFilterTest.java: populate → train → predict → validate,
assert 0.0 <= rmse < 0.5, teardown truncates. The reference runs it
twice (Java7/Java8 differential pair over one spec); here there is one
implementation, so the second run checks determinism instead (seeded
ALS must reproduce the identical RMSE — stronger than the reference's
unseeded threshold-only contract).
"""

from __future__ import annotations

import pytest

from spark_cassandra_collabfiltering_spark import etl
from spark_cassandra_collabfiltering_spark.fixtures import write_ratings_csv
from spark_cassandra_collabfiltering_spark.pipeline import CollabFilterPipeline
from spark_cassandra_collabfiltering_spark.report import REPORT_HEADER
from spark_cassandra_collabfiltering_spark.sources import ParquetStorage


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return write_ratings_csv(str(tmp_path_factory.mktemp("csv") / "ratings.csv"))


def run_pipeline(spark, tmp_path, csv_path):
    storage = ParquetStorage(str(tmp_path))
    with CollabFilterPipeline(spark, storage) as p:
        return p.run(csv_path)


def test_rmse_contract(spark, tmp_path, csv_path):
    result = run_pipeline(spark, tmp_path, csv_path)
    # CollabFilterTest.java:36-37
    assert result.rmse < 0.5
    assert result.rmse >= 0.0


def test_report_shape(spark, tmp_path, csv_path):
    result = run_pipeline(spark, tmp_path, csv_path)
    lines = result.report.splitlines()
    assert lines[0] == REPORT_HEADER
    assert lines[-1].startswith("RMSE = ")
    body = lines[1:-1]
    assert len(body) == 9  # 9 validation rows, none dropped (no cold start)
    # rows sorted by (user, product); fields: u \t p \t pred \t\t actual \t flag
    keys = []
    for line in body:
        fields = line.split("\t")
        assert len(fields) == 6 and fields[3] == ""
        assert fields[5] in ("ERR", "OK")
        keys.append((int(fields[0]), int(fields[1])))
    assert keys == sorted(keys)


def test_determinism(spark, tmp_path, csv_path):
    r1 = run_pipeline(spark, tmp_path / "a", csv_path)
    r2 = run_pipeline(spark, tmp_path / "b", csv_path)
    assert r1.rmse == r2.rmse
    assert r1.report == r2.report


def test_truncate_on_close(spark, tmp_path, csv_path):
    storage = ParquetStorage(str(tmp_path / "t"))
    with CollabFilterPipeline(spark, storage) as p:
        p.run(csv_path)
        assert storage.exists(etl.RATINGS_TABLE)
    # close() truncates both tables (CollabFilterCassandraDriver.java:82-84)
    assert not storage.exists(etl.RATINGS_TABLE)
    assert not storage.exists(etl.VALIDATION_TABLE)
