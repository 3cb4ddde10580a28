"""Item-item k-NN collaborative filtering from co-occurrence — the
classic "users who interacted with this also interacted with..."
recommender (Sarwar et al. 2001, item-based CF; Amazon's item-to-item
shape), built so that EVERY stage is deterministic integer arithmetic:
unlike the ALS solver (M1-M3, rows-only by nature), this recommender
is exactly DuckDB-oracle-able end to end, which makes its NDCG a
hash-matched driver row.

Similarity: binary-vector cosine sim(a,b) = |U_a ∩ U_b| /
sqrt(|U_a|·|U_b|), carried as sim_e6 = (c_ab * 1e6) div
floor(sqrt(n_a·n_b)). Determinism caveat: floor(double-sqrt) equals
true integer isqrt only while n_a·n_b is exactly representable in a
double and away from k²-1 rounding boundaries — i.e. products well
below 2^53. Cross-engine parity with the DuckDB oracle still holds at
ANY size (both engines evaluate the identical IEEE expression), but a
math.isqrt-based replica would diverge above that range. The
``max_user_items`` cap (default 100) and ``max_item_reach`` stop
list are the guardrails: with reach capped at R, n_a·n_b ≤ R² stays
far below 2^53 and floor(sqrt(·)) IS exact integer sqrt — pass
``max_item_reach`` whenever item reach can exceed ~10^6.

Scale shape, stage by stage:

- the per-user item list is CAPPED at ``max_user_items`` by a
  deterministic md5 draw (rank-and-filter) BEFORE the wedge join —
  the hot-user safeguard: one crawler account with 1M interactions
  would otherwise contribute 5·10^11 wedges (the LSH hot-bucket cap
  argument applied to co-occurrence);
- the wedge join keys on user and aggregates immediately to
  (item_a, item_b) counts — partial aggregation collapses wedges
  map-side;
- neighbor lists are a per-item top-k window (bounded fan-out per
  item from there on);
- recommendation scoring joins the user's capped items to the
  bounded neighbor lists, one (user, candidate) hash-agg, an
  anti-join removes already-seen items, and a per-user top-k window
  ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators.relational import md5_draw60
from spark_cassandra_collabfiltering_spark.operators.width import cpu_spread_width


def cap_user_items(
    pairs: DataFrame,
    max_user_items: int = 100,
    user_col: str = "user",
    item_col: str = "product",
) -> DataFrame:
    """Deterministically keep at most ``max_user_items`` interactions
    per user (md5-draw rank, item tiebreak) — the hot-user cap that
    bounds the wedge join. Output: distinct (user, item)."""
    t = pairs.select(F.col(user_col).alias("u"), F.col(item_col).alias("i")).distinct()
    w = Window.partitionBy("u").orderBy(
        md5_draw60(
            F.concat(F.col("u").cast("string"), F.lit(":"), F.col("i").cast("string"))
        ).asc(),
        F.col("i").asc(),
    )
    return (
        t.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_user_items)
        .select("u", "i")
    )


def item_similarity(
    capped: DataFrame,
    max_item_reach: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Co-occurrence cosine over the capped (u, i) pairs. Output one
    row per unordered item pair with c_ab >= ``min_count``:
    (item_a < item_b, c, sim_e6).

    ``max_item_reach`` is the popular-item stop list — the BM25
    stop-list observation applied to co-occurrence: an item touched
    by more than this many users contributes reach^2-grade wedges
    while its normalized cosine to everything is near-noise, so
    dropping it bounds the wedge join's hottest keys (the user cap
    bounds the per-user side; this bounds the per-item side).

    ``min_count`` is the SUPPORT FLOOR (standard item-based CF
    practice since Sarwar et al. 2001): a pair co-occurring once is a
    single co-purchase, yet when both items are rare its cosine
    1e6/sqrt(na*nb) ranks at the TOP of neighbor lists — maximal
    similarity from minimal evidence. On the sparse long tail,
    singleton pairs are ~99% of all pairs (measured: 2.088M of 2.099M
    at sf0.1), so min_count=2 shrinks everything downstream of the
    wedge agg — the count joins here, the neighbor symmetrize+window,
    the scoring fan-in — by two orders of magnitude while measured
    NDCG/MRR tick UP (the dropped edges were noise). The floor is
    applied immediately after the wedge agg, BEFORE the two count
    joins, so those run on the surviving pairs only."""
    if max_item_reach is not None:
        reach = capped.groupBy("i").agg(F.count(F.lit(1)).alias("_r"))
        capped = (
            capped.join(F.broadcast(reach), "i")
            .filter(F.col("_r") <= max_item_reach)
            .select("u", "i")
        )
    # Wedge enumeration stays a self-join on u: an r11 A/B of the
    # graph_triangles-style row-local explode (collect_set + i<j
    # expansion) measured SLOWER here — the SMJ inner loop enumerates
    # pairs inside WholeStageCodegen (~1.8 s single-task at sf0.1)
    # while the higher-order-function explode allocates
    # array/struct/boxed objects per pair (~2.7-3.6 s) — so the
    # pretty rewrite was rejected on evidence (guide §1.2). What WAS
    # wrong: AQE's byte-based coalescing sees only ~0.6 MB of capped
    # pairs and ran the CPU-bound enumeration + partial agg on ONE
    # task. The explicit-width exchange below spreads it; both join
    # arms are projections of the SAME repartition, so ReuseExchange
    # shuffles capped once.
    spread = capped.repartition(cpu_spread_width(capped, 16 << 10), "u")
    a = spread.select("u", F.col("i").alias("ia"))
    b = spread.select("u", F.col("i").alias("ib"))
    co = (
        a.join(b, "u")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    if min_count > 1:
        co = co.filter(F.col("c") >= min_count)
    n = capped.groupBy(F.col("i")).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        co.join(n.select(F.col("i").alias("ia"), F.col("n").alias("na")), "ia")
        .join(n.select(F.col("i").alias("ib"), F.col("n").alias("nb")), "ib")
        .select(
            "ia",
            "ib",
            "c",
            F.expr(
                "(c * 1000000) div cast(floor(sqrt(cast(na * nb as double))) as bigint)"
            ).alias("sim_e6"),
        )
    )


def item_neighbors(sim: DataFrame, k: int = 10) -> DataFrame:
    """Symmetrize the unordered pairs and keep each item's top-k
    neighbors (sim desc, neighbor asc tiebreak). Output:
    (item, neighbor, sim_e6, nrank <= k).

    Symmetrization is a ROW-LOCAL explode of a 2-struct array, not a
    union of two projections: a union duplicates the entire upstream
    plan subtree, so the wedge join + 2M-row pair aggregate feeding
    ``sim`` would execute twice (measured: the two largest exchanges
    in the r9 itemknn plan were the same wedge agg, once per union
    arm). The explode emits the identical row multiset from ONE pass.
    """
    sym = sim.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ia").alias("item"),
                    F.col("ib").alias("neighbor"),
                    F.col("sim_e6"),
                ),
                F.struct(
                    F.col("ib").alias("item"),
                    F.col("ia").alias("neighbor"),
                    F.col("sim_e6"),
                ),
            )
        ).alias("_e")
    ).select("_e.item", "_e.neighbor", "_e.sim_e6")
    w = Window.partitionBy("item").orderBy(
        F.col("sim_e6").desc(), F.col("neighbor").asc()
    )
    return sym.withColumn("nrank", F.row_number().over(w)).filter(
        F.col("nrank") <= k
    )


def recommend(
    capped: DataFrame,
    neighbors: DataFrame,
    k: int = 10,
    user_col: str = "user",
    item_col: str = "product",
) -> DataFrame:
    """Score candidates for every user: sum of sim_e6 from each of the
    user's items to the candidate, already-seen items removed
    (anti-join), per-user top-k by (score desc, item asc). Output:
    (user, product, rank <= k) — the ranking_eval_per_user shape."""
    cand = (
        capped.join(neighbors, capped.i == neighbors.item)
        .select("u", F.col("neighbor").alias("cand"), "sim_e6")
        .groupBy("u", "cand")
        .agg(F.sum("sim_e6").cast("bigint").alias("score"))
    )
    fresh = cand.join(
        capped.select("u", F.col("i").alias("cand")), ["u", "cand"], "left_anti"
    )
    w = Window.partitionBy("u").orderBy(F.col("score").desc(), F.col("cand").asc())
    return (
        fresh.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("u").alias(user_col),
            F.col("cand").alias(item_col),
            "rank",
        )
    )
