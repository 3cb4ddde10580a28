"""F1-F10: scalar functions as Column helpers (SURVEY §2.8).

Every scalar the reference computes in Java closures becomes a built-in
Column expression — JVM-side, inside whole-stage codegen, zero Python in
the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, places: int = 1) -> Column:
    """F4: Util.round (Util.java:8-15) = Math.round(10^p·x)/10^p.

    Spark's ``round`` is HALF_UP, which equals Java ``Math.round``
    (half-toward-positive-infinity) for the non-negative domain used by
    ratings/RMSE. Documented divergence: negative x at exact .5
    boundaries (Math.round(-2.5) = -2 vs HALF_UP → -3) — not reachable
    in the reference's data (ratings ∈ {1,2,4,5}).
    """
    return F.round(col, places)


def err_flag(actual: Column, predicted: Column, threshold: float = 1.0) -> Column:
    """F6: per-row report flag — abs(actual − pred) ≥ 1 → 'ERR' else 'OK'
    (CollabFilterCassandra8.java:70)."""
    return F.when(F.abs(actual - predicted) >= threshold, F.lit("ERR")).otherwise(
        F.lit("OK")
    )


def squared_error(actual: Column, predicted: Column) -> Column:
    """A1: (actual − pred)² (CollabFilterCassandra8.java:50-53)."""
    err = actual - predicted
    return err * err
