"""Token-window chunking pins: the Spark chunker vs a pure-Python
reference replica under hypothesis (arbitrary texts, chunk sizes and
overlaps), plus the structural invariants a retrieval stack relies on
(full coverage, overlap equality between neighbors, bounded sizes)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cassandra_collabfiltering_spark.operators.text import (
    chunk_documents_tokens,
)


def _ref(texts: list[str], chunk: int, overlap: int):
    """Reference replica in plain Python."""
    stride = chunk - overlap
    out = []
    for doc_id, text in enumerate(texts):
        ws = re.findall(r"\S+", text)
        n = len(ws)
        if n == 0:
            continue
        k = max(1, -(-(n - overlap) // stride))  # ceil
        for i in range(k):
            toks = ws[i * stride: i * stride + chunk]
            out.append(
                (doc_id, i, i * stride, len(toks), " ".join(toks))
            )
    return sorted(out)


def _spark_chunks(spark, texts, chunk, overlap):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = chunk_documents_tokens(
        df, chunk_tokens=chunk, overlap=overlap
    ).collect()
    return sorted(
        (r["doc_id"], r["chunk_id"], r["start_token"], r["n_tokens"],
         r["chunk_text"])
        for r in got
    )


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab \t\n"),
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    texts=_texts,
    chunk=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
@pytest.mark.slow
def test_chunker_matches_reference(spark, texts, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    assert _spark_chunks(spark, texts, chunk, overlap) == _ref(
        texts, chunk, overlap
    )


def test_coverage_and_overlap_invariants(spark):
    text = " ".join(f"t{i}" for i in range(101))  # odd tail
    rows = sorted(
        _spark_chunks(spark, [text], 32, 8), key=lambda r: r[1]
    )
    # every token covered exactly once by the NON-overlap prefix walk
    rebuilt = []
    for _, i, start, n, chunk_text in rows:
        toks = chunk_text.split()
        rebuilt += toks if i == len(rows) - 1 else toks[:24]
    # the final chunk may re-cover tail tokens; dedupe by position
    assert rebuilt[:101] == [f"t{i}" for i in range(101)]
    # neighbors share exactly the overlap
    for (_, _, _, _, a), (_, _, _, nb, b) in zip(rows, rows[1:]):
        assert a.split()[24:] == b.split()[: min(8, nb)]
    # sizes bounded; only the last chunk may be short
    for _, i, _, n, _ in rows[:-1]:
        assert n == 32
    assert 0 < rows[-1][3] <= 32


def test_bad_params_refused(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_tokens(df, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_tokens(df, chunk_tokens=8, overlap=-1)
