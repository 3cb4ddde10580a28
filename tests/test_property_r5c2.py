"""Property tests (hypothesis) for the second round-5 continuation
batch: URL-canonicalization idempotence, triangle counts vs a
brute-force reference on random graphs, and affine invariance of the
integer median/MAD outlier flags.
"""

from __future__ import annotations

import pytest

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import (
    aggregates as agg,
    curation as cu,
    graph as gr,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_hosts = st.sampled_from(["Example.com", "WWW.example.COM", "a.b.example.com:8080"])
_paths = st.sampled_from(["", "/", "/x//y/", "/Docs/3", "/a/b/c"])
_queries = st.sampled_from(
    ["", "?b=2&a=1", "?utm_source=x&a=1", "?gclid=z", "?a=1&a=1&z="]
)
_frags = st.sampled_from(["", "#f", "#a b"])
urls = st.builds(
    lambda h, p, q, f: f"http://{h}{p}{q}{f}", _hosts, _paths, _queries, _frags
)


@SETTINGS
@given(batch=st.lists(urls, min_size=1, max_size=8))
@pytest.mark.slow
def test_url_canonicalization_idempotent(spark, batch):
    """canon(canon(u)) == canon(u): the canonical form is a fixed
    point, so re-ingesting already-canonical URLs can never re-split
    a dedup group."""
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    out = df.select(
        cu.canonicalize_url(F.col("url")).alias("c1"),
        cu.canonicalize_url(cu.canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r.c1 == r.c2, (r.c1, r.c2)


edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=16
)


@SETTINGS
@given(pairs=edges_strategy)
@pytest.mark.slow
def test_triangle_counts_match_bruteforce(spark, pairs):
    """Degree-oriented counts equal the O(n^3) reference on any small
    graph, including duplicates, self-loops, and both orientations."""
    simple = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = {v for e in simple for v in e}
    expect = dict.fromkeys(nodes, 0)
    for x, y, z in combinations(sorted(nodes), 3):
        if {(x, y), (x, z), (y, z)} <= simple:
            for v in (x, y, z):
                expect[v] += 1
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(0, 0)], "src bigint, dst bigint"
    )
    got = {r.node: r.n_triangles for r in gr.triangle_counts(df).collect()}
    assert got == expect


values_strategy = st.lists(st.integers(-1000, 1000), min_size=1, max_size=20)


@SETTINGS
@given(xs=values_strategy, a=st.integers(1, 5), b=st.integers(-50, 50))
@pytest.mark.slow
def test_mad_outlier_flags_affine_invariant(spark, xs, a, b):
    """x -> a*x + b (a > 0) scales med2/mad4 exactly and cannot change
    which rows are flagged — the point of a robust scale statistic."""
    rows = [("g", x) for x in xs] + [("g2", 7)]
    df = spark.createDataFrame(rows, "grp string, x bigint")
    base = {r.grp: r for r in agg.robust_outliers(df, "grp", "x").collect()}
    df2 = df.withColumn("x", F.col("x") * a + b)
    trans = {r.grp: r for r in agg.robust_outliers(df2, "grp", "x").collect()}
    g0, g1 = base["g"], trans["g"]
    assert g1.med2 == a * g0.med2 + 2 * b
    assert g1.mad4 == a * g0.mad4
    assert g1.n_outliers == g0.n_outliers
