"""Engine schemas (SURVEY §1).

The reference's data model is one record shape — a rating —
declared three times (CQL DDL at src/sql/collab_filter_setup.sql:4-5,
Java bean RatingDO.java:17-20, positional CSV parse at
CollabFilterCassandraDriver.java:131-132). Here it is one StructType
each, declared once.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Tag constants for the raw CSV's set column (RatingDO.java:14-15 uses the
# line prefixes "I," / "V,"; with a schema'd reader the tag is a column).
TRAINING_TAG = "I"
VALIDATION_TAG = "V"

# Raw CSV: 11 positional fields, no header (data/csv/readme.txt:2-11).
# Only fields 0-3 are semantic; 4-10 are spreadsheet-generator scaffolding
# kept as strings so the reader never fails on them, then pruned.
RAW_CSV_SCHEMA = T.StructType(
    [
        T.StructField("set", T.StringType(), True),
        T.StructField("user", T.IntegerType(), True),
        T.StructField("product", T.IntegerType(), True),
        T.StructField("rating", T.DoubleType(), True),
    ]
    + [T.StructField(f"gen{i}", T.StringType(), True) for i in range(4, 11)]
)

# Stored rating tables (ratings / validation): id is the reference's
# timeuuid surrogate PK (RatingDO.java:30); Spark has no uuid type so it
# is a string, excluded from value-checked outputs (nondeterministic).
RATING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("user", T.IntegerType(), False),
        T.StructField("product", T.IntegerType(), False),
        T.StructField("rating", T.DoubleType(), False),
    ]
)

# ALS scoring output (CollabFilterCassandra8.java:39-43 analog).
PREDICTION_SCHEMA = T.StructType(
    [
        T.StructField("user", T.IntegerType(), False),
        T.StructField("product", T.IntegerType(), False),
        T.StructField("prediction", T.DoubleType(), False),
    ]
)
