"""End-to-end lifecycle (SURVEY §3): the reference driver as a context
manager.

CollabFilterCassandraDriver.java:
- ctor builds conf + context (:25-26,50-54)    → get_spark()
- populateTables (:86-92)                      → etl.populate_tables
- trainAndValidate (:56-69)                    → train → predict →
  validate → results_report
- close() truncates (:71-84)                   → __exit__

Fix applied per SURVEY §1.3: the validation table feeds three consumers
(predict input, join actuals, report); the reference re-scans Cassandra
each time — here the DataFrame is .cache()d once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from spark_cassandra_collabfiltering_spark import etl
from spark_cassandra_collabfiltering_spark.ml import collabfilter as cf
from spark_cassandra_collabfiltering_spark.report import results_report
from spark_cassandra_collabfiltering_spark.sources import Storage


@dataclass
class RunResult:
    rmse: float
    report: str
    predictions: DataFrame
    validation: DataFrame


class CollabFilterPipeline:
    """``with CollabFilterPipeline(spark, storage) as p: p.run(csv)``."""

    def __init__(self, spark: SparkSession, storage: Storage):
        self.spark = spark
        self.storage = storage
        self._cached: list[DataFrame] = []

    def run(self, csv_path: str) -> RunResult:
        training, validation = etl.populate_tables(self.spark, csv_path, self.storage)
        validation = validation.cache()
        self._cached.append(validation)

        model = cf.train(training)
        predictions = cf.predict(model, validation).cache()
        self._cached.append(predictions)

        rmse = cf.validate(predictions, validation)
        report = results_report(predictions, validation, rmse)
        return RunResult(rmse=rmse, report=report, predictions=predictions, validation=validation)

    # -- lifecycle (≙ try-with-resources + truncate-on-close, C3) --
    def __enter__(self) -> "CollabFilterPipeline":
        return self

    def close(self) -> None:
        for df in self._cached:
            df.unpersist()
        self._cached.clear()
        for table in (etl.RATINGS_TABLE, etl.VALIDATION_TABLE):
            self.storage.truncate(self.spark, table)

    def __exit__(self, *exc) -> None:
        self.close()
