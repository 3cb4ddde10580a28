"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference collaborative-filtering workload
(JoshuaFox/Spark-Cassandra-Collabfiltering), rebuilt Spark-first.

Everything is DataFrame/Catalyst based: sources and sinks are DataSource
reads/writes, operators are Column expressions (JVM-side, whole-stage
codegen), ML is ``pyspark.ml`` ALS, and the large-scale extensions
(dedup, similarity search, text analysis, multimodal plumbing) are
shuffle-parallel DataFrame plans with Arrow-batched Pandas UDFs only
where built-ins cannot express the semantics.
"""

from spark_cassandra_collabfiltering_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
