"""Ranking eval harness (ml/ranking.py): fixed-point NDCG weights,
hand-computed metric parity, perfect/no-hit edge users, popularity
tiebreaks, and split determinism."""

from __future__ import annotations

import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.ml import ranking as rk  # noqa: E402


def test_ndcg_weights_fixed_points():
    w = rk.ndcg_weights_e6(10)
    assert w[0] == 1_000_000          # 1/log2(2) exact
    assert w == sorted(w, reverse=True)
    assert len(set(w)) == 10          # strictly decreasing in fact
    assert w[3] == 1_000_000_000 // rk._log2lin_e3(5)


def test_ranking_eval_hand_computed(spark):
    # global list: items 100, 200, 300 at ranks 1..3
    topk = spark.createDataFrame(
        [(100, 1), (200, 2), (300, 3)], "item bigint, rank int"
    )
    # u1: m=2, hits at ranks 1 and 3; u2: m=1, hit at rank 2;
    # u3: m=2, no hits
    val = spark.createDataFrame(
        [(1, 100), (1, 300), (2, 200), (3, 900), (3, 901)],
        "user bigint, product bigint",
    )
    got = rk.ranking_eval(topk, val, k=3).collect()[0]
    w = rk.ndcg_weights_e6(3)
    cum = [w[0], w[0] + w[1], w[0] + w[1] + w[2]]
    ndcg1 = ((w[0] + w[2]) * 1000000) // cum[1]
    ndcg2 = (w[1] * 1000000) // cum[0]
    want_ndcg = (ndcg1 + ndcg2 + 0) // 3
    want_recall = ((2 * 1000000) // 2 + (1 * 1000000) // 1 + 0) // 3
    assert got.n_users == 3 and got.n_val_pairs == 5 and got.hits == 3
    assert got.mean_ndcg_e6 == want_ndcg
    assert got.mean_recall_e6 == want_recall
    # MRR: u1 first hit at rank 1, u2 at rank 2, u3 none
    assert got.mean_mrr_e6 == (1000000 + 1000000 // 2 + 0) // 3


def test_ranking_eval_perfect_user(spark):
    # validation items exactly the top-2 of the list -> ndcg = recall = 1
    topk = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "item bigint, rank int"
    )
    val = spark.createDataFrame([(7, 10), (7, 20)], "user bigint, product bigint")
    got = rk.ranking_eval(topk, val, k=3).collect()[0]
    assert got.mean_ndcg_e6 == 1_000_000
    assert got.mean_recall_e6 == 1_000_000
    assert got.mean_mrr_e6 == 1_000_000


def test_popularity_topk_reach_and_tiebreak(spark):
    train = spark.createDataFrame(
        [
            # item 5: 3 distinct users; 7: 2; 9: 2 (tie with 7 -> item asc)
            (1, 5), (2, 5), (3, 5), (1, 5),
            (1, 7), (2, 7),
            (2, 9), (3, 9),
            (1, 11),
        ],
        "user bigint, product bigint",
    )
    got = [(r.item, r.rank) for r in rk.popularity_topk(train, k=3).collect()]
    assert sorted(got, key=lambda t: t[1]) == [(5, 1), (7, 2), (9, 3)]


def test_hash_split_is_deterministic_partition(spark):
    ratings = spark.range(500).selectExpr(
        "id % 50 as user", "id % 37 as product"
    ).distinct()
    t1, v1 = rk.hash_split_pairs(ratings)
    t2, v2 = rk.hash_split_pairs(ratings.repartition(13))
    a = {(r.user, r.product) for r in t1.collect()}
    b = {(r.user, r.product) for r in t2.collect()}
    assert a == b
    n = ratings.count()
    assert t1.count() + v1.count() == n and v1.count() > 0


def test_per_user_eval_agrees_with_global_when_lists_identical(spark):
    """A global list replicated per-user must score identically
    through both harness entry points."""
    topk = spark.createDataFrame(
        [(100, 1), (200, 2), (300, 3)], "item bigint, rank int"
    )
    val = spark.createDataFrame(
        [(1, 100), (1, 300), (2, 200), (3, 900), (3, 901)],
        "user bigint, product bigint",
    )
    users = val.select("user").distinct()
    recs = users.crossJoin(topk).select(
        "user", topk.item.alias("product"), "rank"
    )
    a = rk.ranking_eval(topk, val, k=3).collect()[0]
    b = rk.ranking_eval_per_user(recs, val, k=3).collect()[0]
    assert a.asDict() == b.asDict()


@pytest.mark.slow
def test_cf_ndcg_als_runs_and_is_deterministic(spark):
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["cf_ndcg_als"].builder(spark, sf).collect()[0]
    b = QUERIES["cf_ndcg_als"].builder(spark, sf).collect()[0]
    assert a.asDict() == b.asDict()  # seeded ALS + md5 split
    assert a.n_users > 0
    assert 0 <= a.mean_ndcg_e6 <= 1_000_000
    assert 0 <= a.mean_recall_e6 <= 1_000_000
