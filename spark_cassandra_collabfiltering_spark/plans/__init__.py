"""Query plans: the registry lives in
spark_cassandra_collabfiltering_spark.plans.queries (import the module
directly — its ``queries``/``oracle_sql`` functions are the driver
contract surface)."""
