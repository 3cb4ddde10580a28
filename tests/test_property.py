"""Property-based tests (hypothesis) for the extended join operators —
the invariants that matter can't be covered by one fixture:

- asof_join == the naive per-row 'latest right at or before' lookup
- salted_join == the plain join, for ANY data and bucket count
- range_join_bucketed == the plain BETWEEN join
- upsert: updated keys take the update, others pass through, no dupes

Examples are kept small (Spark job per example); deadline disabled —
JVM scheduling jitter would false-fail hypothesis' default 200ms.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import joins_ext as jx
from spark_cassandra_collabfiltering_spark.operators.relational import upsert

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)


@SETTINGS
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
)
def test_asof_join_matches_naive(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, lts int, lid int"
    )
    rrows = [(k, t, i) for i, (k, t) in enumerate(right)]
    rdf = spark.createDataFrame(rrows, "k int, rts int, rid int")
    out = jx.asof_join(
        ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid", "rts"], tiebreak="rid",
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}

    def naive(k, lts):
        cands = [(rt, ri) for (rk, rt, ri) in rrows if rk == k and rt <= lts]
        return max(cands)[1] if cands else None

    want = {i: naive(k, t) for i, (k, t) in enumerate(left)}
    assert got == want


@SETTINGS
@given(
    big=st.lists(st.tuples(keys, st.integers(0, 99)), min_size=0, max_size=15),
    small=st.lists(st.tuples(keys, st.text("ab", max_size=2)), min_size=0, max_size=6),
    buckets=st.integers(min_value=1, max_value=5),
)
def test_salted_join_equals_plain_join(spark, big, small, buckets):
    bdf = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(big)], "k int, v int, rid int"
    )
    sdf = spark.createDataFrame(small, "k int, name string")
    salted = jx.salted_join(bdf, sdf, on=["k"], salt_from="rid", buckets=buckets)
    plain = bdf.join(sdf, "k")
    a = sorted(map(tuple, salted.select("k", "v", "rid", "name").collect()))
    b = sorted(map(tuple, plain.select("k", "v", "rid", "name").collect()))
    assert a == b


@SETTINGS
@given(
    vals=st.lists(st.integers(0, 200), min_size=0, max_size=15),
    edges=st.sets(st.integers(0, 200), min_size=2, max_size=5),
)
def test_range_join_bucketed_equals_between_join(spark, vals, edges):
    bands = [
        (lo, hi, f"b{j}")
        for j, (lo, hi) in enumerate(zip(sorted(edges), sorted(edges)[1:]))
    ]
    fact = spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "val long, rid int")
    bdf = spark.createDataFrame(bands, "lo long, hi long, band string")
    got = sorted(
        map(tuple, jx.range_join_bucketed(fact, "val", bdf, bucket_width=7)
            .select("rid", "band").collect())
    )
    want = sorted(
        (i, b) for i, v in enumerate(vals) for (lo, hi, b) in bands if lo <= v < hi
    )
    assert got == want


@SETTINGS
@given(
    target=st.dictionaries(keys, st.integers(0, 9), max_size=6),
    updates=st.dictionaries(keys, st.integers(10, 19), max_size=6),
)
def test_upsert_semantics(spark, target, updates):
    tdf = spark.createDataFrame(list(target.items()) or [], "k int, v int")
    udf = spark.createDataFrame(list(updates.items()) or [], "k int, v int")
    got = {r["k"]: r["v"] for r in upsert(tdf, udf, ["k"]).collect()}
    want = {**target, **updates}
    assert got == want
    assert len(got) == len(want)  # no duplicate keys


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


words = st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"])


@SETTINGS
@given(
    values=st.lists(words, min_size=1, max_size=60),
    capacity=st.integers(min_value=2, max_value=10),
)
def test_space_saving_bounds_hold_for_any_input(spark, values, capacity):
    """Mergeable Misra-Gries invariants for ANY value multiset and any
    counter capacity: est is a lower bound, est + max_err an upper
    bound, and every value with true count > max_err is emitted."""
    from collections import Counter

    from spark_cassandra_collabfiltering_spark.operators.aggregates import (
        space_saving_topk,
    )

    truth = Counter(values)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = space_saving_topk(df, "v", k=len(truth), capacity=capacity).collect()
    max_err = rows[0]["max_err"] if rows else 0
    emitted = {r["value"] for r in rows}
    for r in rows:
        assert r["est"] <= truth[r["value"]] <= r["est"] + max_err, (
            r, truth, max_err,
        )
    for v, n in truth.items():
        if n > max_err:
            assert v in emitted, (v, n, max_err, rows)


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=6, max_size=24), min_size=2, max_size=10
    ),
    cap=st.integers(min_value=1, max_value=4),
)
@pytest.mark.slow
def test_lsh_band_cap_is_monotone_subset(spark, texts, cap):
    """For ANY corpus: capped candidate pairs ⊆ uncapped, and raising
    the cap can only add pairs (monotone in max_band_bucket)."""
    from spark_cassandra_collabfiltering_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    sets = dd.doc_shingle_sets(df, "doc_id", "text", n=3)
    sigs = dd.minhash_signature_table(sets, "doc_id", n_hashes=8)

    def pairs(c):
        return {
            (r["id_a"], r["id_b"])
            for r in dd.lsh_candidate_pairs(
                sigs, "doc_id", n_hashes=8, bands=4, max_band_bucket=c
            ).collect()
        }

    capped, looser, uncapped = pairs(cap), pairs(cap + 1), pairs(None)
    assert capped <= looser <= uncapped
