from spark_cassandra_collabfiltering_spark.sources.csv_source import read_ratings_csv
from spark_cassandra_collabfiltering_spark.sources.tables import (
    CassandraStorage,
    ParquetStorage,
    Storage,
    read_testdata,
    register_testdata_views,
)

__all__ = [
    "read_ratings_csv",
    "Storage",
    "ParquetStorage",
    "CassandraStorage",
    "read_testdata",
    "register_testdata_views",
]
