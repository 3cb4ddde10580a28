"""Pins for text.vocab_build: dense contiguous ids, (cnt desc, token)
ordering, min_count gate, and invariance to the bucketing prefix_len
(the ids must equal the global row_number regardless of how the
two-level rank buckets the vocabulary).
"""

from __future__ import annotations

from spark_cassandra_collabfiltering_spark.operators import text as tx


def _vocab(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return {
        r.token: (r.cnt, r.vocab_id)
        for r in tx.vocab_build(df, "text", **kw).collect()
    }


def test_ids_dense_and_frequency_ordered(spark):
    got = _vocab(
        spark,
        ["bb aa bb cc", "bb aa zz", "cc bb"],
        min_count=1,
    )
    # counts: bb=4, aa=2, cc=2, zz=1 -> ids 0,1,2,3 (cc after aa: tie
    # broken lexicographically)
    assert got == {"bb": (4, 0), "aa": (2, 1), "cc": (2, 2), "zz": (1, 3)}


def test_min_count_gate(spark):
    got = _vocab(spark, ["x x y"], min_count=2)
    assert got == {"x": (2, 0)}


def test_prefix_len_invariance(spark):
    # same corpus, different bucketing widths -> identical ids
    texts = [
        "alpha beta alpha gamma delta beta epsilon",
        "beta gamma alpha zeta eta theta gamma",
        "iota kappa alpha beta mu nu xi omicron pi",
    ]
    a = _vocab(spark, texts, min_count=1, prefix_len=1)
    b = _vocab(spark, texts, min_count=1, prefix_len=2)
    c = _vocab(spark, texts, min_count=1, prefix_len=3)
    assert a == b == c
    # dense 0..V-1
    assert sorted(vid for _, vid in a.values()) == list(range(len(a)))


def test_lowercase_fold(spark):
    got = _vocab(spark, ["Foo foo FOO bar"], min_count=1)
    assert got == {"foo": (3, 0), "bar": (1, 1)}


def test_empty_corpus(spark):
    got = _vocab(spark, [""], min_count=1)
    assert got == {}


def test_ngram_diversity_separates_repetitive_slice(spark):
    """A slice of copy-paste docs must score far lower diversity than
    a slice of distinct docs of the same size."""
    dup = [("dup", "alpha beta gamma delta epsilon zeta")] * 6
    uniq = [
        ("uniq", "one two three four five six"),
        ("uniq", "seven eight nine ten eleven twelve"),
        ("uniq", "red green blue cyan magenta yellow"),
        ("uniq", "ant bee cat dog elk fox"),
        ("uniq", "oak elm fir ash yew pine"),
        ("uniq", "sun moon star comet nova nebula"),
    ]
    df = spark.createDataFrame(dup + uniq, "source string, text string")
    got = {r.source: r for r in tx.ngram_diversity(df, "source", "text").collect()}
    assert got["dup"].total_ngrams == got["uniq"].total_ngrams == 30
    assert got["dup"].distinct_ngrams == 5
    assert got["uniq"].distinct_ngrams == 30
    assert got["dup"].diversity_e6 < got["uniq"].diversity_e6 == 1_000_000
    assert got["dup"].ttr_e6 < got["uniq"].ttr_e6


# --- oov_rate --------------------------------------------------------------


def test_oov_rate_counts_hapaxes(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta zzz"),   # zzz is corpus-unique -> OOV
            (2, "alpha beta beta"),
            (3, "qqq www"),                # both hapax -> 100% OOV
        ],
        "doc_id bigint, text string",
    )
    vocab = tx.vocab_build(docs, "text", min_count=2)
    got = {r.doc_id: r for r in tx.oov_rate(docs, vocab).collect()}
    assert (got[1].n_tokens, got[1].n_oov) == (4, 1)
    assert got[1].oov_e6 == 250000
    assert (got[2].n_tokens, got[2].n_oov) == (3, 0)
    assert (got[3].n_tokens, got[3].n_oov, got[3].oov_e6) == (2, 2, 1000000)
