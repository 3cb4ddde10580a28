"""Ranking-metric evaluation for recommenders (NDCG@k / recall@k) in
EXACT fixed-point integers — the offline eval harness that grades any
top-k recommender (the ALS model of M1-M3, or the popularity baseline
here) against held-out interactions.

Everything is engine-portable by construction:

- the train/validation split is a pure-function-of-the-row md5 draw
  (never ``randomSplit`` — a resampled split is not reproducible
  across engines or even runs with different partitioning);
- the NDCG position discount 1/log2(i+1) uses the fixed-point
  bit-length log2 (:func:`~..operators.text._log2lin_e3` semantics,
  replicated here in Python for the bounded position table) — the
  discounts are PRECOMPUTED integer literals shared verbatim by the
  Spark plan and the DuckDB oracle, so the metric hash-matches;
- per-user metrics are floor-scaled e6 integers, aggregated with
  integer sums.

Scale shape: the top-k list is bounded (k rows) and BROADCASTS onto
the validation pairs; per-user aggregation is one hash-agg on user.
Nothing about the corpus of interactions is collected or re-joined
doc x doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _log2lin_e3(x: int) -> int:
    e = x.bit_length() - 1
    return e * 1000 + ((x - (1 << e)) * 1000) // (1 << e)


def ndcg_weights_e6(k: int) -> list[int]:
    """Position discounts w_i = floor(1e9 / log2lin_e3(i+1)) for
    i = 1..k — integer DCG gain per relevant hit at rank i (binary
    relevance). w_1 = 1e9/1000 = 1_000_000 (log2(2) exact)."""
    return [1_000_000_000 // _log2lin_e3(i + 1) for i in range(1, k + 1)]


def hash_split_pairs(
    ratings: DataFrame,
    train_pct: int = 80,
    user_col: str = "user",
    item_col: str = "product",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, validation) split of interaction pairs by
    an md5 draw of 'user:item' — stable across engines, runs, retries,
    and partitionings."""
    from spark_cassandra_collabfiltering_spark.operators.relational import (
        md5_draw60,
    )

    keyed = ratings.withColumn(
        "_b",
        md5_draw60(
            F.concat(
                F.col(user_col).cast("string"),
                F.lit(":"),
                F.col(item_col).cast("string"),
            )
        )
        % 100,
    )
    return (
        keyed.filter(F.col("_b") < train_pct).drop("_b"),
        keyed.filter(F.col("_b") >= train_pct).drop("_b"),
    )


def popularity_topk(
    train: DataFrame,
    k: int = 10,
    user_col: str = "user",
    item_col: str = "product",
) -> DataFrame:
    """The popularity baseline every ranking eval needs as its floor:
    items ranked by distinct-user reach in train (count desc, item asc
    tiebreak). Output (item, rank), bounded at k rows — broadcastable
    by construction."""
    from pyspark.sql import Window

    pop = train.groupBy(F.col(item_col).alias("item")).agg(
        F.count_distinct(F.col(user_col)).alias("reach")
    )
    w = Window.orderBy(F.col("reach").desc(), F.col("item").asc())
    return (
        pop.orderBy(F.col("reach").desc(), F.col("item").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("item", "rank")
    )



def _metrics_from_hits(vj: DataFrame, hits: DataFrame, k: int) -> DataFrame:
    """Shared metric core: ``vj`` = (u, item) validation pairs, ``hits``
    = (u, rank, _w) one row per recommended-and-relevant item carrying
    its position and weight. Produces the one-row exact-integer
    summary (NDCG@k, recall@k, and MRR@k — reciprocal of the FIRST
    hit's rank, 1e6 div min_rank, 0 for users with no hit)."""
    w = ndcg_weights_e6(k)
    cumw = [0]
    for x in w:
        cumw.append(cumw[-1] + x)
    idcg = F.element_at(
        F.array(*[F.lit(x) for x in cumw[1:]]),
        F.least(F.col("m"), F.lit(k)).cast("int"),
    )
    per_hit = hits.groupBy("u").agg(
        F.sum("_w").cast("bigint").alias("dcg"),
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.min("rank").cast("bigint").alias("first_rank"),
    )
    per_user = (
        vj.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .join(per_hit, "u", "left")
        .select(
            "m",
            F.coalesce("dcg", F.lit(0)).alias("dcg"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce(
                F.expr("1000000 div first_rank"), F.lit(0)
            ).alias("rr_e6"),
            idcg.alias("idcg"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("m").cast("bigint").alias("n_val_pairs"),
        F.sum("n_hits").cast("bigint").alias("hits"),
        F.expr("sum((dcg * 1000000) div idcg) div count(1)")
        .cast("bigint")
        .alias("mean_ndcg_e6"),
        F.expr("sum((n_hits * 1000000) div m) div count(1)")
        .cast("bigint")
        .alias("mean_recall_e6"),
        F.expr("sum(rr_e6) div count(1)").cast("bigint").alias("mean_mrr_e6"),
    )


def _wt(k: int):
    return F.element_at(
        F.array(*[F.lit(x) for x in ndcg_weights_e6(k)]), F.col("rank")
    )


def ranking_eval(
    topk: DataFrame,
    val: DataFrame,
    k: int = 10,
    user_col: str = "user",
    item_col: str = "product",
) -> DataFrame:
    """Grade a GLOBAL top-k list (item, rank) against held-out
    (user, item) pairs: one summary row with exact-integer metrics.

    Per validation user u with m_u held-out items and hits at ranks
    R_u = {i : item_i in val(u)}:

    - DCG_u  = sum_{i in R_u} w_i   (w = :func:`ndcg_weights_e6`)
    - IDCG_u = sum_{i=1..min(m_u,k)} w_i  (binary relevance ideal)
    - ndcg_u_e6   = (DCG_u * 1e6) div IDCG_u
    - recall_u_e6 = (|R_u| * 1e6) div m_u

    Output: (n_users, n_val_pairs, hits, mean_ndcg_e6, mean_recall_e6)
    where the means are floor-e6 macro averages over validation users.
    The top-k side broadcasts; the only exchange is the per-user
    hash-agg."""
    vj = val.select(F.col(user_col).alias("u"), F.col(item_col).alias("item"))
    hits = vj.join(F.broadcast(topk), "item").select(
        "u", "rank", _wt(k).alias("_w")
    )
    return _metrics_from_hits(vj, hits, k)


def ranking_eval_per_user(
    recs: DataFrame,
    val: DataFrame,
    k: int = 10,
    user_col: str = "user",
    item_col: str = "product",
) -> DataFrame:
    """Same metrics as :func:`ranking_eval`, for PER-USER
    recommendation lists (user, item, rank) — the shape
    ``ALSModel.recommendForAllUsers`` produces. The join keys on
    (user, item), so the recs side shuffles once on user like any
    fact-fact join; everything else is identical (exact integer
    weights, floor-e6 macro means)."""
    vj = val.select(F.col(user_col).alias("u"), F.col(item_col).alias("item"))
    rj = recs.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item"), "rank"
    ).filter(F.col("rank") <= k)
    hits = vj.join(rj, ["u", "item"]).select("u", "rank", _wt(k).alias("_w"))
    return _metrics_from_hits(vj, hits, k)
