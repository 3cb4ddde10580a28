"""Hypertable-style continuous-aggregate rollup: maintain a
fine-grained partial-aggregate table once, answer every coarser-grain
query by MERGING partials instead of re-scanning raw events.

Scale rationale (the 100 TB story): the raw events table is touched
once per refresh (incremental — only new time buckets, partition-
pruned by time), and every dashboard query over ANY coarser grain
reads the partial table, which is orders of magnitude smaller than
the raw stream. This is TimescaleDB's continuous aggregate / Druid's
rollup segment re-expressed as plain DataFrames over a lake table.

Correctness contract: every partial state kept here is associative
and commutative —

- ``n_events``: count → merged by sum;
- ``sum_value_dec``: DECIMAL-space sum (exact at 2dp source
  precision, order-independent — see operators/aggregates.py on why
  double summation is not) → merged by sum;
- ``min_value`` / ``max_value`` → merged by min/max —

so merging hourly partials to days is bit-equal to aggregating the
raw events straight to days (property-tested, incl. the incremental
union-of-refreshes path, in tests/test_rollup.py; oracle-checked as
ev_rollup_merge). The same contract is what makes the streaming
foreachBatch upsert (streaming/events.py) a valid incremental
refresher for this table.

No reference counterpart (reference scope is SURVEY §2.4's global
mean); this is the driver-mandated custom-operator family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exposed partial-state columns (everything needed to merge and to
# finalize count/sum/avg/min/max at any coarser grain).
PARTIAL_COLS = ["n_events", "sum_value_dec", "min_value", "max_value"]


def time_bucket(ts: Column, seconds: int) -> Column:
    """Integer time bucket: floor(epoch_seconds / seconds). Buckets
    nest exactly when the coarse width is a multiple of the fine one
    (floor(floor(t/a)/k) == floor(t/(a·k)) for k ≥ 1), which is what
    makes re-bucketing partials safe."""
    return F.floor(F.unix_timestamp(ts) / seconds).cast("bigint")


def rollup_partials(
    events: DataFrame,
    bucket_seconds: int = 3600,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """The fine-grained partial table: one row per (bucket, keys) with
    mergeable states. This is the table you persist (partitioned by a
    time prefix of ``bucket`` at scale) and refresh incrementally —
    refreshing a time slice only scans that slice's raw rows."""
    return events.groupBy(
        time_bucket(F.col(ts_col), bucket_seconds).alias("bucket"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value_dec"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(
    partials: DataFrame,
    factor: int,
    key_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Coarsen partials by ``factor`` (e.g. 24 hourly → daily): merge
    the associative states. Reads ONLY the partial table — the raw
    events never re-scan. Also the union-merge for incremental
    refresh: partials from separate refresh runs over disjoint (or
    even overlapping-bucket) slices merge with factor=1."""
    return partials.groupBy(
        F.floor(F.col("bucket") / factor).cast("bigint").alias("bucket")
        if factor > 1
        else F.col("bucket"),
        *key_cols,
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").alias("sum_value_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize(
    merged: DataFrame, key_cols: tuple[str, ...] = ("event_type",), places: int = 6
) -> DataFrame:
    """Resolve partial states to user-facing columns (sum back to
    double, avg as one final division — deterministic; see
    aggregates.decimal_avg for the rounding rationale)."""
    return merged.select(
        "bucket",
        *key_cols,
        F.col("n_events"),
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        F.col("min_value"),
        F.col("max_value"),
        F.round(
            F.col("sum_value_dec").cast("double") / F.col("n_events"), places
        ).alias("avg_value"),
    )


def signed_delta_partials(
    inserts: DataFrame,
    deletes: DataFrame,
    group_cols: list[str],
    cents_col: Column,
) -> DataFrame:
    """Signed partial state for INCREMENTAL VIEW MAINTENANCE: fold an
    insert batch (+1 multiplicity) and a delete/retraction batch (-1)
    into one per-group delta of (count, sum-of-cents). Only the delta
    batches are scanned — never the base table the view was built
    over. Money rides as exact bigint cents, so the partials commute
    and merge bit-exactly (the same contract as PARTIAL_COLS)."""
    signed = inserts.select(
        *group_cols, cents_col.alias("_c"), F.lit(1).alias("_sgn")
    ).unionByName(
        deletes.select(
            *group_cols, cents_col.alias("_c"), F.lit(-1).alias("_sgn")
        )
    )
    return signed.groupBy(*group_cols).agg(
        F.sum("_sgn").cast("bigint").alias("n_rows"),
        F.sum(F.col("_sgn") * F.col("_c")).cast("bigint").alias("sum_cents"),
    )


def apply_agg_delta(
    view: DataFrame, delta: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Refresh a count/sum aggregate VIEW by merging a signed delta —
    the Materialize/Flink retract-stream shape expressed as plain
    DataFrames. The view and delta are both (group_cols, n_rows,
    sum_cents) partial tables; the merge is a union + one hash-agg on
    the (bounded) group grain, then groups whose refreshed count hits
    zero vanish (a fully-retracted group leaves the view, it does not
    linger as a zero row). The base table is never rescanned: refresh
    cost scales with |delta| + |view grain|, not |base| — the whole
    point of IVM at 100 TB."""
    merged = view.select(*group_cols, "n_rows", "sum_cents").unionByName(
        delta.select(*group_cols, "n_rows", "sum_cents")
    )
    return (
        merged.groupBy(*group_cols)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_cents").cast("bigint").alias("sum_cents"),
        )
        .filter(F.col("n_rows") != 0)
    )
