from spark_cassandra_collabfiltering_spark.sources.csv_source import read_ratings_csv
from spark_cassandra_collabfiltering_spark.sources.jsonl_source import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)
from spark_cassandra_collabfiltering_spark.sources.tables import (
    CassandraStorage,
    ParquetStorage,
    Storage,
    read_testdata,
    register_testdata_views,
)
from spark_cassandra_collabfiltering_spark.sources.fixedwidth_source import (
    FWField,
    read_fixed_width,
)
from spark_cassandra_collabfiltering_spark.sources.warc_source import read_warc

__all__ = [
    "read_ratings_csv",
    "read_jsonl",
    "split_corrupt",
    "write_jsonl",
    "read_warc",
    "FWField",
    "read_fixed_width",
    "Storage",
    "ParquetStorage",
    "CassandraStorage",
    "read_testdata",
    "register_testdata_views",
]
