from spark_cassandra_collabfiltering_spark.functions.scalar import (
    err_flag,
    round_half_up,
    squared_error,
)

__all__ = ["round_half_up", "err_flag", "squared_error"]
