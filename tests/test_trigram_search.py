"""Pins for the r5-cont5 operator batch: trigram substring search,
2D skyline sweep, interval concurrency, incremental view maintenance.

Each pin targets the semantics the sf-testdata oracle can't isolate:
the trigram candidate-not-match trap, skyline dominance tie rules,
midnight-splitting / touching-interval concurrency, and full
retraction in the IVM merge."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import (
    relational as rel,
    rollup as ru,
    text as tx,
)
from spark_cassandra_collabfiltering_spark.streaming import events as ev


# ---------------------------------------------------------------- trigram

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_trigram_search_counts_occurrences(spark):
    docs = _docs(
        spark,
        [
            (1, "xx merge batch yy merge batch zz"),  # 2 hits
            (2, "no hits here"),
            (3, "merge batch"),  # exact-length doc, 1 hit
        ],
    )
    got = {
        r.doc_id: r.n_occurrences
        for r in tx.trigram_search(docs, "merge batch").collect()
    }
    assert got == {1: 2, 3: 1}


def test_trigram_candidate_superset_trap_rejected(spark):
    # Doc 9 contains EVERY trigram of "abcdef" (abc, bcd, cde, def)
    # but never the contiguous pattern: it is a candidate the verify
    # step must reject — the necessary-not-sufficient trap.
    docs = _docs(spark, [(9, "abcd cdef bcde"), (10, "zabcdefz")])
    pats = {"abcdef"[i : i + 3] for i in range(4)}
    grams = {
        r.gram
        for r in tx.trigram_postings(docs).filter(F.col("doc_id") == 9).collect()
    }
    assert pats <= grams  # doc 9 IS a candidate...
    got = tx.trigram_search(docs, "abcdef").collect()
    assert [(r.doc_id, r.n_occurrences) for r in got] == [(10, 1)]  # ...but no match


def test_trigram_short_docs_and_patterns(spark):
    docs = _docs(spark, [(1, "ab"), (2, None), (3, "abc")])
    # <3-char docs and NULL text emit no postings
    assert tx.trigram_postings(docs).filter(
        F.col("doc_id").isin(1, 2)
    ).count() == 0
    assert [r.doc_id for r in tx.trigram_search(docs, "abc").collect()] == [3]
    with pytest.raises(ValueError):
        tx.trigram_search(docs, "ab")


# ---------------------------------------------------------------- skyline

def test_skyline_dominance_tie_rules(spark):
    # (1,9) and (9,1): frontier corners. (5,5): not dominated. (5,6):
    # dominated by (5,5) (equal x, strictly larger y). (2,9):
    # dominated by (1,9) (equal y, strictly larger x). Duplicate
    # points (5,5) don't dominate each other -> n_members = 2.
    rows = [
        (1, 1, 9), (2, 9, 1), (3, 5, 5), (4, 5, 5), (5, 5, 6), (6, 2, 9),
    ]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = {
        (r.x, r.y): (r.n_members, r.min_id)
        for r in rel.skyline_2d(df, "x", "y", "id").collect()
    }
    assert got == {(1, 9): (1, 1), (9, 1): (1, 2), (5, 5): (2, 3)}


def test_skyline_matches_naive_dominance(spark):
    import itertools
    import random

    rnd = random.Random(42)
    rows = [(i, rnd.randint(0, 6), rnd.randint(0, 6)) for i in range(60)]
    pts = {(x, y) for _, x, y in rows}
    expect = {
        (x, y)
        for x, y in pts
        if not any(
            (a <= x and b <= y and (a < x or b < y)) for a, b in pts
        )
    }
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = {(r.x, r.y) for r in rel.skyline_2d(df, "x", "y", "id").collect()}
    assert got == expect


# ------------------------------------------------------------ concurrency

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    )


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_concurrency_overlap_and_touching(spark):
    rows = [
        # user 1: session 10:00-10:10; user 2: 10:05-10:15 (overlap=2)
        (1, _ts("2024-03-01 10:00:00"), 1),
        (2, _ts("2024-03-01 10:10:00"), 1),
        (3, _ts("2024-03-01 10:05:00"), 2),
        (4, _ts("2024-03-01 10:15:00"), 2),
        # user 3 starts exactly when user 2 ends: closed intervals touch
        (5, _ts("2024-03-01 10:15:00"), 3),
    ]
    got = ev.session_concurrency(_events(spark, rows)).collect()
    assert [(r.day, r.peak_concurrent, r.n_segments) for r in got] == [
        ("2024-03-01", 2, 3)
    ]


def test_concurrency_midnight_split(spark):
    rows = [
        # one session 23:50 -> 00:20 next day (events 10 min apart, gap<30m)
        (1, _ts("2024-03-01 23:50:00"), 1),
        (2, _ts("2024-03-02 00:00:30"), 1),
        (3, _ts("2024-03-02 00:20:00"), 1),
        # a second user only on day 2
        (4, _ts("2024-03-02 00:10:00"), 2),
    ]
    got = {
        r.day: (r.peak_concurrent, r.n_segments)
        for r in ev.session_concurrency(_events(spark, rows)).collect()
    }
    assert got == {"2024-03-01": (1, 1), "2024-03-02": (2, 2)}


def test_concurrency_gap_splits_sessions(spark):
    rows = [
        (1, _ts("2024-03-01 08:00:00"), 1),
        (2, _ts("2024-03-01 09:00:00"), 1),  # >30 min gap -> new session
    ]
    got = ev.session_concurrency(_events(spark, rows)).collect()
    # two zero-length sessions, never simultaneous
    assert [(r.day, r.peak_concurrent, r.n_segments) for r in got] == [
        ("2024-03-01", 1, 2)
    ]


# -------------------------------------------------------------------- IVM

def test_ivm_merge_equals_recompute_and_retracts(spark):
    base = spark.createDataFrame(
        [("A", 100), ("A", 200), ("B", 500)], "k string, cents bigint"
    )
    view = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
    inserts = spark.createDataFrame([("A", 50)], "k string, cents bigint")
    deletes = spark.createDataFrame(
        [("A", 100), ("B", 500)], "k string, cents bigint"
    )
    delta = ru.signed_delta_partials(inserts, deletes, ["k"], F.col("cents"))
    got = {
        r.k: (r.n_rows, r.sum_cents)
        for r in ru.apply_agg_delta(view, delta, ["k"]).collect()
    }
    # B fully retracted -> gone, not a zero row; A merged exactly
    assert got == {"A": (2, 250)}


def test_ivm_insert_only_new_group(spark):
    view = spark.createDataFrame(
        [("A", 1, 10)], "k string, n_rows bigint, sum_cents bigint"
    )
    inserts = spark.createDataFrame([("C", 7)], "k string, cents bigint")
    deletes = inserts.limit(0)
    delta = ru.signed_delta_partials(inserts, deletes, ["k"], F.col("cents"))
    got = {
        r.k: (r.n_rows, r.sum_cents)
        for r in ru.apply_agg_delta(view, delta, ["k"]).collect()
    }
    assert got == {"A": (1, 10), "C": (1, 7)}


# -------------------------------------------------- windowed join / cohorts

def test_windowed_join_bounds_and_buckets(spark):
    from spark_cassandra_collabfiltering_spark.operators import joins_ext as jx

    left = spark.createDataFrame(
        [(1, 1, 10_000), (2, 1, 50_000)], "lid bigint, k bigint, lts bigint"
    )
    right = spark.createDataFrame(
        [
            (10, 1, 10_000),  # exactly at left 1 (inclusive upper)
            (11, 1, 5_000),   # window [5000,10000] lower edge inclusive
            (12, 1, 4_999),   # just outside
            (13, 1, 49_000),  # inside left 2's window
            (14, 2, 10_000),  # wrong key
        ],
        "rid bigint, k bigint, rts bigint",
    )
    got = {
        (r.lid, r.rid)
        for r in jx.windowed_join(
            left, right, on=["k"], left_ts_us="lts", right_ts_us="rts",
            window_us=5_000, bucket_us=1_000,
        ).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 13)}

    with pytest.raises(ValueError):
        jx.windowed_join(left, right, ["k"], "lts", "rts", 0)


def test_multitouch_conserves_revenue(spark):
    # total attributed cents must equal total purchase cents for every
    # purchase that has >=1 click in window — to the cent, including
    # non-divisible remainders (997 split 3 ways).
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # user 1: 3 clicks then a 9.97 purchase
        (1, base, 1, "click", 0.0),
        (2, base + dt.timedelta(minutes=1), 1, "click", 0.0),
        (3, base + dt.timedelta(minutes=2), 1, "click", 0.0),
        (4, base + dt.timedelta(minutes=3), 1, "purchase", 9.97),
        # user 2: purchase with no clicks -> unattributed (absent)
        (5, base, 2, "purchase", 5.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r.click_id: (r.attributed_cents, r.n_purchases)
            for r in QUERIES["j10_multitouch_attribution"]
            .builder(spark, d)
            .collect()
        }
    # 997 = 333 + 332 + 332, remainder cent to the EARLIEST click
    assert out == {1: (333, 1), 2: (332, 1), 3: (332, 1)}


def test_retention_cohorts_triangle(spark):
    rows = [
        # user 1 first on day 0, returns day 2; user 2 first day 0;
        # user 3 first on day 2 (its own cohort)
        (1, _ts("2024-03-01 10:00:00"), 1),
        (2, _ts("2024-03-03 10:00:00"), 1),
        (3, _ts("2024-03-01 11:00:00"), 2),
        (4, _ts("2024-03-03 09:00:00"), 3),
        (5, _ts("2024-03-03 23:00:00"), 3),  # same day, counted once
    ]
    got = {
        (r.cohort, r.offset_days): r.n_users
        for r in ev.retention_cohorts(_events(spark, rows)).collect()
    }
    assert got == {
        ("2024-03-01", 0): 2,
        ("2024-03-01", 2): 1,
        ("2024-03-03", 0): 1,
    }


# ----------------------------------------------------------- epoch shuffle

def test_epoch_shuffle_is_seeded_bijection(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.position for r in rel.epoch_shuffle(df, "doc_id", "e1").collect()}
    # bijection onto 0..n-1
    assert sorted(a.values()) == list(range(300))
    # bit-reproducible under re-run
    b = {r.doc_id: r.position for r in rel.epoch_shuffle(df, "doc_id", "e1").collect()}
    assert a == b
    # a different seed is a different permutation (overwhelmingly)
    c = {r.doc_id: r.position for r in rel.epoch_shuffle(df, "doc_id", "e2").collect()}
    assert c != a and sorted(c.values()) == list(range(300))


# --------------------------------------------------- covariance / rolling

def test_covariance_pairs_matches_numpy_and_signs(spark):
    import numpy as np

    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    rnd = np.random.RandomState(7)
    x = rnd.randint(0, 1000, 200)
    y = (-3 * x + rnd.randint(0, 500, 200))  # strongly negative cov
    z = rnd.randint(0, 50, 200)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y, z)],
        "x bigint, y bigint, z bigint",
    )
    got = {
        (r.x_name, r.y_name): r
        for r in agg.covariance_pairs(df, ["x", "y", "z"]).collect()
    }
    assert set(got) == {("x", "x"), ("x", "y"), ("x", "z"),
                        ("y", "y"), ("y", "z"), ("z", "z")}
    n = 200
    for (a_name, b_name), r in got.items():
        a = {"x": x, "y": y, "z": z}[a_name].astype(object)
        b = {"x": x, "y": y, "z": z}[b_name].astype(object)
        num = n * int(sum(a * b)) - int(sum(a)) * int(sum(b))
        sign = -1 if num < 0 else 1
        expect = sign * (abs(num) * 1_000_000 // (n * n))
        assert r.cov_e6 == expect, (a_name, b_name)
    assert got[("x", "y")].cov_e6 < 0  # the engineered negative pair


def test_rolling_daily_range_frame_handles_gaps(spark):
    rows = [
        # type a: days 0, 1, then a GAP, then day 10 — the day-10 roll
        # must NOT include days 0/1 (range frame, not row frame)
        (1, _ts("2024-03-01 01:00:00"), 1, "a", 1.00),
        (2, _ts("2024-03-02 01:00:00"), 1, "a", 2.00),
        (3, _ts("2024-03-11 01:00:00"), 1, "a", 4.00),
        (4, _ts("2024-03-02 02:00:00"), 1, "a", 0.50),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double"
    )
    got = {
        r.day: (r.n, r.cents, r.roll_n, r.roll_cents)
        for r in ev.rolling_daily(df).collect()
    }
    assert got == {
        "2024-03-01": (1, 100, 1, 100),
        "2024-03-02": (2, 250, 3, 350),   # includes day 1 (within 7)
        "2024-03-11": (1, 400, 1, 400),   # gap: window holds only itself
    }


def test_trigram_search_paths_agree(spark):
    docs = _docs(
        spark,
        [
            (1, "xx merge batch yy merge batch zz"),
            (2, "no hits"),
            (9, "abcd cdef bcde"),   # candidate-not-match for 'abcdef'
            (10, "zabcdefz"),
        ],
    )
    for pat in ("merge batch", "abcdef"):
        a = sorted(
            map(tuple, tx.trigram_search(docs, pat, via="rowlocal").collect())
        )
        b = sorted(
            map(tuple, tx.trigram_search(docs, pat, via="postings").collect())
        )
        assert a == b, pat
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tx.trigram_search(docs, "abc", via="nope")


# ----------------------------------------------------- empty-input hardening

def test_fifth_batch_ops_handle_empty_inputs(spark):
    empty_pts = spark.createDataFrame([], "id bigint, x bigint, y bigint")
    assert rel.skyline_2d(empty_pts, "x", "y", "id").count() == 0

    empty_ev = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint"
    )
    assert ev.session_concurrency(empty_ev).count() == 0
    assert ev.retention_cohorts(empty_ev).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert tx.trigram_search(empty_docs, "abc").count() == 0
    assert rel.epoch_shuffle(empty_docs, "doc_id").count() == 0

    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    empty_xy = spark.createDataFrame([], "x bigint, y bigint")
    # one moment row with n=0 -> division guarded? cov on an empty
    # frame must return pair rows with NULL cov, never crash
    out = agg.covariance_pairs(empty_xy, ["x", "y"]).collect()
    assert {(r.x_name, r.y_name) for r in out} == {("x", "x"), ("x", "y"), ("y", "y")}
    assert all(r.n == 0 and r.cov_e6 is None for r in out)


def test_streaks_gaps_and_islands(spark):
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES
    import spark_cassandra_collabfiltering_spark.plans.queries as q

    rows = [
        # user 1: days 0,1,2 then 5,6 -> longest 3, 2 streaks, 5 active
        (1, _ts("2024-03-01 10:00:00"), 1),
        (2, _ts("2024-03-02 10:00:00"), 1),
        (3, _ts("2024-03-02 23:00:00"), 1),  # same day, counted once
        (4, _ts("2024-03-03 10:00:00"), 1),
        (5, _ts("2024-03-06 10:00:00"), 1),
        (6, _ts("2024-03-07 10:00:00"), 1),
        # user 2: one day
        (7, _ts("2024-03-01 00:00:00"), 2),
    ]
    df = _events(spark, rows)
    orig = q.t
    try:
        q.t = lambda s, sf, name, _df=df: _df
        got = {
            r.user_id: (r.longest_streak, r.n_streaks, r.n_active_days)
            for r in QUERIES["ev_streaks"].builder(spark, "x").collect()
        }
    finally:
        q.t = orig
    assert got == {1: (3, 2, 5), 2: (1, 1, 1)}
