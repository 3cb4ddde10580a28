"""Property tests (hypothesis) for the round-5 continuation operators:
span interval-merge invariants, vocab-id density, HLL duplicate
invariance, and PageRank mass bounds on random graphs.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cassandra_collabfiltering_spark.operators import (
    dedup as dd,
    graph as gr,
    text as tx,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
doc_texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=5,
)


@SETTINGS
@given(texts=doc_texts)
@pytest.mark.slow
def test_span_invariants(spark, texts):
    """For any corpus: spans are within-doc non-overlapping and
    non-adjacent (maximal), ordered, n_dup_grams <= span_len - n + 1,
    and every span is at least n words long."""
    n = 3
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    rows = dd.duplicate_spans(df, "doc_id", "text", n=n).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_len == r.span_end - r.span_start + 1 >= n
        assert 1 <= r.n_dup_grams <= r.span_len - n + 1
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1  # maximal: a gap of >= 1 word between spans


@SETTINGS
@given(texts=doc_texts)
@pytest.mark.slow
def test_vocab_ids_always_dense_and_ordered(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = tx.vocab_build(df, "text", min_count=1).collect()
    ids = sorted(r.vocab_id for r in rows)
    assert ids == list(range(len(rows)))
    ordered = sorted(rows, key=lambda r: r.vocab_id)
    for a, b in zip(ordered, ordered[1:]):
        assert (a.cnt, a.token) != (b.cnt, b.token)
        assert a.cnt > b.cnt or (a.cnt == b.cnt and a.token < b.token)


@SETTINGS
@given(
    values=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
    reps=st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow
def test_hll_duplicate_invariance(spark, values, reps):
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg

    a = spark.createDataFrame([("g", v) for v in values], "g string, v bigint")
    b = spark.createDataFrame([("g", v) for v in values * reps], "g string, v bigint")
    ra = sorted(map(tuple, agg.hll_registers(a, ["g"], "v").collect()))
    rb = sorted(map(tuple, agg.hll_registers(b, ["g"], "v").collect()))
    assert ra == rb


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=5),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow
def test_pagerank_mass_bounds_on_random_graphs(spark, pairs):
    """Symmetric closure of any random pair set: one rank row per
    node, every rank positive, total <= SCALE (floor leakage only
    shrinks mass, never creates it)."""
    sym = list({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    edges = spark.createDataFrame(sym, "src bigint, dst bigint")
    rows = gr.pagerank(edges, iters=3).collect()
    nodes = {a for a, _ in sym} | {b for _, b in sym}
    assert {r.node for r in rows} == nodes
    assert all(r.rank_e12 > 0 for r in rows)
    assert sum(r.rank_e12 for r in rows) <= gr.SCALE_E12
