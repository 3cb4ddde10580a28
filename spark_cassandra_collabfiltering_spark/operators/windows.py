"""Window functions (SURVEY §2.5 — absent from the reference; the
capability-parity queries it implies, e.g. top-k products per user,
mirroring MatrixFactorizationModel.recommendProducts which the
reference never calls).

Window execution = shuffle on partitionBy keys + per-partition sort.
Scale rule: the partition key must be fine-grained (per-user, per-order
— millions of small groups parallelize; a constant key funnels 100 TB
through one task). All helpers take explicit tiebreaker columns so
results are deterministic under parallel execution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """row_number over (partition by group order by order_cols) ≤ k.
    The rank filter executes before any downstream shuffle, so only
    k rows per group survive the window stage."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    value_col: str,
    alias: str = "running_sum",
) -> DataFrame:
    """Cumulative sum per group (rows unbounded-preceding..current)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value_col).over(w))


def range_frame_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    range_preceding: int,
    aggs: Sequence[tuple[Column, str]],
) -> DataFrame:
    """Value-range window frame: for each row, aggregate over peer rows
    whose ``order_col`` lies in ``[current - range_preceding, current]``.

    RANGE frames are the time-window analytic the reference lacks
    (SURVEY §2.5): "sum of activity in the trailing hour per user" is
    ``rangeBetween(-3600, 0)`` over epoch seconds/micros. Unlike ROWS
    frames, frame membership is defined by the ORDER value, so ties
    (peers) are always all-in — deterministic without a tiebreaker.
    Execution = one shuffle on the partition keys + per-partition sort;
    Spark evaluates sliding range frames incrementally, not O(n²).
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(order_col).asc())
        .rangeBetween(-range_preceding, Window.currentRow)
    )
    return df.select("*", *[a.over(w).alias(name) for a, name in aggs])


def lag_delta(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    value_col: str,
    alias: str = "delta",
) -> DataFrame:
    """value − lag(value) per group — the change-since-previous query."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(alias, F.col(value_col) - F.lag(value_col, 1).over(w))
