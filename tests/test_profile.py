"""Column profiler (aggregates.profile_columns): null/ndv/min-max
rendering pins, including the decimal rendering rule for doubles."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg  # noqa: E402


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, "a", None),
            (3, None, 2.5),
            (4, "b", 1e20),
        ],
        "id bigint, s string, x double",
    )
    got = {r.column: r for r in agg.profile_columns(df).collect()}
    assert set(got) == {"id", "s", "x"}
    assert all(r.n_rows == 4 for r in got.values())
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert got["x"].n_null == 1 and got["x"].n_distinct == 3
    assert got["id"].n_null == 0 and got["id"].n_distinct == 4
    assert (got["id"].min_val, got["id"].max_val) == ("1", "4")
    assert (got["s"].min_val, got["s"].max_val) == ("a", "b")
    # doubles render via DECIMAL(30,6) — no engine-specific E-notation
    assert got["x"].min_val == "1.500000"
    assert got["x"].max_val == "100000000000000000000.000000"


def test_profile_columns_subset_and_all_null(spark):
    df = spark.createDataFrame(
        [(None,), (None,)], "y double"
    )
    got = agg.profile_columns(df, ["y"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_null == 2 and r.n_distinct == 0
    assert r.min_val is None and r.max_val is None
