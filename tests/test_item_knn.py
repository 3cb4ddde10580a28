"""Item-item kNN recommender (ml/item_knn.py): integer cosine
hand-checks, hot-user cap determinism, seen-item exclusion, and the
quality contract — on a taste-clustered corpus the personalized
recommender must beat the popularity baseline through the same exact
NDCG harness (on structureless random data it legitimately does not,
which is why the pin lives on a structured fixture)."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.ml import item_knn as ik  # noqa: E402
from spark_cassandra_collabfiltering_spark.ml import ranking as rk  # noqa: E402


def test_item_similarity_integer_cosine(spark):
    pairs = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)],
        "user bigint, product bigint",
    )
    capped = ik.cap_user_items(pairs)
    got = {(r.ia, r.ib): (r.c, r.sim_e6) for r in ik.item_similarity(capped).collect()}
    # c(10,20)=2, n10=3, n20=2 -> 2e6 // isqrt(6)=2 -> 1_000_000
    assert got[(10, 20)] == (2, 2_000_000 // math.isqrt(6))
    # c(10,30)=1, n10=3, n30=1 -> 1e6 // isqrt(3)=1 -> 1_000_000
    assert got[(10, 30)] == (1, 1_000_000 // math.isqrt(3))
    assert (20, 30) not in got  # no co-occurrence


def test_cap_user_items_bounds_and_determinism(spark):
    pairs = spark.range(500).selectExpr("1 as user", "id as product")
    a = {tuple(r) for r in ik.cap_user_items(pairs, max_user_items=50).collect()}
    b = {
        tuple(r)
        for r in ik.cap_user_items(
            pairs.repartition(7), max_user_items=50
        ).collect()
    }
    assert len(a) == 50 and a == b  # capped AND partition-invariant


def test_recommend_excludes_seen_and_ranks_by_summed_sim(spark):
    pairs = spark.createDataFrame(
        # cluster A: items 1,2,3 always together; singleton user sees 1,2
        [(u, i) for u in (1, 2, 3) for i in (101, 102, 103)] + [(9, 101), (9, 102)],
        "user bigint, product bigint",
    )
    capped = ik.cap_user_items(pairs)
    nbr = ik.item_neighbors(ik.item_similarity(capped), k=5)
    recs = ik.recommend(capped, nbr, k=5)
    mine = [(r.product, r.rank) for r in recs.filter("user = 9").collect()]
    assert mine and mine[0] == (103, 1)  # the missing cluster item tops
    assert all(p not in (101, 102) for p, _ in mine)  # seen items excluded


def test_itemknn_beats_popularity_on_clustered_tastes(spark):
    # two disjoint taste clusters + a globally popular head item that
    # every user touched: popularity recommends the head + noise,
    # item-kNN recommends within-cluster.
    rows = []
    for u in range(40):
        cluster = 100 if u % 2 == 0 else 200
        for j in range(6):
            rows.append((u, cluster + j))
        rows.append((u, 999))  # global head
    pairs = spark.createDataFrame(rows, "user bigint, product bigint")
    train, val = rk.hash_split_pairs(pairs, train_pct=70)
    capped = ik.cap_user_items(train)
    nbr = ik.item_neighbors(ik.item_similarity(capped), k=10)
    recs = ik.recommend(capped, nbr, k=10)
    knn = rk.ranking_eval_per_user(recs, val, k=10).collect()[0]
    pop = rk.ranking_eval(
        rk.popularity_topk(train, k=10), val, k=10
    ).collect()[0]
    assert knn.mean_ndcg_e6 > pop.mean_ndcg_e6
    assert knn.mean_recall_e6 > pop.mean_recall_e6


def test_item_similarity_reach_stop_list(spark):
    # item 999 touched by every user floods the wedge join; the reach
    # cap drops it from similarity entirely while sparse pairs survive
    rows = [(u, 999) for u in range(20)] + [(1, 10), (1, 20), (2, 10), (2, 20)]
    pairs = spark.createDataFrame(rows, "user bigint, product bigint")
    capped = ik.cap_user_items(pairs)
    sim = {
        (r.ia, r.ib)
        for r in ik.item_similarity(capped, max_item_reach=10).collect()
    }
    assert (10, 20) in sim
    assert not any(999 in p for p in sim)
    full = {(r.ia, r.ib) for r in ik.item_similarity(capped).collect()}
    assert any(999 in p for p in full)  # default keeps it


def test_item_similarity_support_floor(spark):
    # (10, 20) co-occurs for two users; (10, 30) for one. The floor
    # keeps evidence-backed pairs and drops singletons — which would
    # otherwise rank TOP of the neighbor list (c=1 with rare items is
    # maximal cosine from minimal evidence).
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)]
    pairs = spark.createDataFrame(rows, "user bigint, product bigint")
    capped = ik.cap_user_items(pairs)
    full = {(r.ia, r.ib): r.c for r in ik.item_similarity(capped).collect()}
    assert full == {(10, 20): 2, (10, 30): 1}
    floored = {
        (r.ia, r.ib): r.c
        for r in ik.item_similarity(capped, min_count=2).collect()
    }
    assert floored == {(10, 20): 2}
    # sim_e6 of the survivor is identical under the floor (the floor
    # prunes pairs, never changes a surviving pair's cosine)
    f = {r.ia: r.sim_e6 for r in ik.item_similarity(capped).collect()
         if (r.ia, r.ib) == (10, 20)}
    g = {r.ia: r.sim_e6
         for r in ik.item_similarity(capped, min_count=2).collect()
         if (r.ia, r.ib) == (10, 20)}
    assert f == g
