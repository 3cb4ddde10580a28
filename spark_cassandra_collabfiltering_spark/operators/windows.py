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
