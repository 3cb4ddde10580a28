"""Extended join operators absent from the reference workload
(SURVEY §2.3 explicitly lists as-of / range / skew-handled joins as
absent) — implemented Spark-first as capability-plus operators.

Scale stances:

- **as-of join**: NOT a range-expanded join (which explodes) — a
  union-merge: tag both sides, one window sort per key, last_value
  with ignorenulls. One shuffle on the key; state per row is O(1).
  This is the classic distributed as-of strategy for time-series at
  any scale.
- **range join**: bucketize both sides so the non-equi predicate
  becomes an equi-join on (bucket) plus a residual filter. Without
  this, Spark plans BroadcastNestedLoopJoin — fine for a tiny band
  table, quadratic death at scale. Buckets use exact integer
  arithmetic (scaled units) so results are engine-portable.
- **salted join**: shard hot keys by appending a deterministic salt
  to the big side and exploding the small side ×S. Result is
  byte-identical to the plain join; only the shuffle distribution
  changes. Use when a handful of keys dominate (AQE skew-join
  handles sort-merge skew automatically; salting is the explicit
  fix when you must pin the strategy or the skew is extreme).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, attach ``right_cols`` from
    the latest right row with right_ts <= left_ts and equal keys
    (NULLs when no prior right row exists).

    Union-merge plan: right rows sort before left rows at equal
    timestamps (inclusive semantics); ``last(col, ignorenulls)`` over
    an UNBOUNDED PRECEDING window carries the most recent right values
    onto each left row. Ties among right rows at the same timestamp
    resolve by ``tiebreak`` ascending (last = max wins).
    """
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).select(*l_tagged.columns)  # align column order
    order = [F.col("_asof_ts").asc(), F.col("_is_right").desc()]
    if tiebreak:
        order.append(
            F.when(F.col("_is_right") == 1, F.col(f"_r_{tiebreak}")).asc_nulls_first()
        )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *[F.col(c) for c in left.columns],
        "_is_right",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_is_right") == 0).drop("_is_right")


def range_join_bucketed(
    fact: DataFrame,
    fact_value: str,
    bands: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 250,
) -> DataFrame:
    """Join fact rows into half-open value bands [lo, hi) via
    bucketization: both sides gain an integer bucket key
    (value // width; bands explode to every covered bucket), the join
    becomes an equi-join on bucket, and the band predicate remains as
    a cheap residual filter. Expects integer-scaled values (exact
    arithmetic). The band table stays tiny → broadcast, but the plan
    shape survives a band table of millions where a nested-loop range
    join would not.
    """
    w = bucket_width
    banded = bands.select(
        "*",
        F.explode(
            F.sequence(
                (F.col(lo_col) / w).cast("long"),
                ((F.col(hi_col) - 1) / w).cast("long"),
            )
        ).alias("_bucket"),
    )
    facted = fact.withColumn("_bucket", (F.col(fact_value) / w).cast("long"))
    return (
        facted.join(F.broadcast(banded), on="_bucket")
        .filter(
            (F.col(fact_value) >= F.col(lo_col)) & (F.col(fact_value) < F.col(hi_col))
        )
        .drop("_bucket")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-resilient equi-join: big side salted by a deterministic
    hash of ``salt_from`` (any column that spreads rows within a hot
    key), small side exploded ×buckets so every (key, salt) partition
    finds its match. Output equals the unsalted join exactly; the
    shuffle spreads each hot key over ``buckets`` reducers.
    """
    b = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(buckets)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return b.join(s, on=[*on, "_salt"]).drop("_salt")


def windowed_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts_us: str,
    right_ts_us: str,
    window_us: int,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """TIME-WINDOWED join: every right row whose timestamp falls in
    [left_ts - window, left_ts] joins its left row — the multi-touch
    attribution / feature-lookback primitive (as-of gives ONE
    predecessor; this gives ALL of them inside a bounded window).

    Scale shape — the same bucketization discipline as
    :func:`range_join_bucketed`, applied to the time axis: the left
    side explodes to every time bucket its window covers (a BOUNDED
    window_us/bucket_us + 1 rows), the right side keys by its own
    bucket, and the join becomes a plain shuffled equi-join on
    (on..., bucket) with the window predicate left as a residual
    filter. Fan-out is fixed by the knob ratio, never by data skew;
    an unbounded per-key sort-and-scan (or a pure key equi-join with
    a time filter) would instead fan out by the hottest key's row
    count. Timestamps are integer microseconds (exact arithmetic).
    """
    if window_us <= 0 or bucket_us <= 0:
        raise ValueError("window_us and bucket_us must be positive")
    lb = F.explode(
        F.sequence(
            F.expr(f"({left_ts_us} - {window_us}) div {bucket_us}"),
            F.expr(f"{left_ts_us} div {bucket_us}"),
        )
    ).alias("_tb")
    l_k = left.select("*", lb)
    r_k = right.withColumn("_tb", F.expr(f"{right_ts_us} div {bucket_us}"))
    return (
        l_k.join(r_k, on=on + ["_tb"])
        .filter(
            (F.col(right_ts_us) <= F.col(left_ts_us))
            & (F.col(right_ts_us) >= F.col(left_ts_us) - window_us)
        )
        .drop("_tb")
    )
