"""Property tests (hypothesis) for the sixth round-5 continuation
batch: PPJoin == the quadratic all-pairs join on random corpora,
bottom-k merge associativity, KMV overlap exactness under k >= |union|,
and expectations_check vs a pure-Python recount."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from spark_cassandra_collabfiltering_spark.operators import (
    aggregates as agg,
    curation as cu,
    dedup as dd,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_WORDS = ["fox", "dog", "river", "bank", "cloud", "query", "join", "scan"]


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=10),
        min_size=2,
        max_size=7,
    )
)
@pytest.mark.slow
def test_ppjoin_equals_quadratic_on_random_corpora(spark, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dd.ngram_jaccard_pairs(df, "doc_id", "text", n=4, threshold=0.4).collect()
    )
    got = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dd.ppjoin_pairs(df, "doc_id", "text", n=4, threshold=0.4).collect()
    )
    assert got == want


@SETTINGS
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (group, value)
        min_size=1,
        max_size=40,
    ),
    k=st.sampled_from([4, 8]),
)
@pytest.mark.slow
def test_bottomk_merge_associativity(spark, vals, k):
    """sketch(all) == merge(merge(s(A), s(B)), s(C)) for any 3-way
    split — merge order can't matter (membership is a pure function
    of the row's own draw vs the k-th smallest)."""
    rows = [(g, v, i) for i, (g, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v long, key long")
    direct = agg.bottomk_sample(df, ["g"], "v", "key", k=k)
    parts = [df.filter(F.col("key") % 3 == i) for i in range(3)]
    states = [agg.bottomk_sample(p, ["g"], "v", "key", k=k) for p in parts]
    m12 = agg.bottomk_merge(states[0].unionByName(states[1]), ["g"], k=k)
    m = agg.bottomk_merge(m12.unionByName(states[2]), ["g"], k=k)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, m.collect()))


@SETTINGS
@given(
    sa=st.sets(st.integers(0, 60), min_size=1, max_size=20),
    sb=st.sets(st.integers(0, 60), min_size=1, max_size=20),
)
def test_kmv_overlap_exact_under_k(spark, sa, sb):
    rows = [("A", v) for v in sa] + [("B", v) for v in sb]
    df = spark.createDataFrame(rows, "g string, v long")
    st_tbl = agg.kmv_state(df, ["g"], "v", k=256)
    out = agg.kmv_overlap_pairs(st_tbl, "g", k=256).collect()
    assert len(out) == 1
    r = out[0]
    inter, union = len(sa & sb), len(sa | sb)
    assert r.k_u == union and r.n_common == inter
    assert r.union_est == union and r.inter_est == inter
    assert r.jaccard_e6 == inter * 1000000 // union


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.integers(-5, 20),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_expectations_match_python_recount(spark, rows):
    df = spark.createDataFrame(rows, "k int, x int")
    out = {
        r.rule: (r.n_checked, r.n_violations)
        for r in cu.expectations_check(
            df,
            rules=[("k_not_null", "k IS NOT NULL"), ("x_positive", "x > 0")],
            unique_cols=["k"],
        ).collect()
    }
    n = len(rows)
    assert out["k_not_null"] == (n, sum(1 for k, _ in rows if k is None))
    assert out["x_positive"] == (n, sum(1 for _, x in rows if x <= 0))
    nonnull = [k for k, _ in rows if k is not None]
    assert out["unique:k"] == (n, n - len(set(nonnull)))
