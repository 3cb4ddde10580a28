"""Local DuckDB differential harness (SURVEY §5.3-3).

Mirrors the driver's t2 check: run the Spark builder and the oracle SQL
on the same parquet, canonicalize (columns sorted by name, rows sorted
by all columns), and compare values EXACTLY — floats too, because the
driver compares value-hashes. Any query that fails exact float equality
here would hash-mismatch there; fix the query's determinism, don't
loosen the comparator.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from spark_cassandra_collabfiltering_spark.sources.tables import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for tbl in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(path):
            conn.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')"
            )
    return conn


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return CompareResult(name, False, f"columns {list(s.columns)} vs {list(o.columns)}")
    if len(s) != len(o):
        return CompareResult(name, False, f"row count {len(s)} vs {len(o)}")
    # Dtype-KIND parity: the driver's value-hash is representation-
    # sensitive across kinds — a DuckDB HUGEINT (sum over INTEGER)
    # lands in pandas as float64/object and hashes differently from
    # Spark's int64 even when every value is equal (r1:
    # q12_priority_classes, dedup_simhash). Width differences within a
    # kind (int32 vs int64, datetime64[ns] vs [us]) hash identically —
    # r1 driver rows for q3/w1/w4/f_scalar_suite were green — so only
    # kind mismatches fail here.
    for col in s.columns:
        ks, ko = s[col].dtype.kind, o[col].dtype.kind
        if ks != ko:
            return CompareResult(
                name, False,
                f"dtype-kind col {col}: spark={s[col].dtype}({ks}) vs "
                f"oracle={o[col].dtype}({ko}) (cast the oracle, e.g. ::BIGINT)",
            )
    for col in s.columns:
        a, b = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return CompareResult(
                        name, False, f"col {col} row {i}: {x!r} != {y!r} (Δ={x-y!r})"
                    )
            elif pd.isna(x) and pd.isna(y):
                continue
            elif x != y:
                return CompareResult(name, False, f"col {col} row {i}: {x!r} != {y!r}")
    return CompareResult(name, True, f"{len(s)} rows x {len(s.columns)} cols exact-match")


def run_compare(
    spark: SparkSession, sf_dir: str, name: str, conn: duckdb.DuckDBPyConnection | None = None
) -> CompareResult:
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    q = QUERIES[name]
    if q.oracle is None:
        sdf = q.builder(spark, sf_dir)
        n = sdf.count()
        return CompareResult(name, True, f"rows-only (no oracle): {n} rows")
    own = conn is None
    conn = conn or duckdb_conn(sf_dir)
    try:
        spark_pdf = q.builder(spark, sf_dir).toPandas()
        oracle_pdf = conn.sql(q.oracle).df()
        return compare_frames(name, spark_pdf, oracle_pdf)
    finally:
        if own:
            conn.close()
