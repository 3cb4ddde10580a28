"""Edge-case units for the Gopher-style repetition features: the
corpus oracle (text_repetition, exact-match) covers the bulk path;
these pin the degenerate shapes the corpus doesn't contain — empty
text, fewer words than the n-gram order, and a fully-repeated doc.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import text as tx  # noqa: E402

COLS = [
    "n_2grams",
    "n_3grams",
    "dup_2gram_frac_e6",
    "dup_3gram_frac_e6",
    "top_2gram_frac_e6",
]


def _feats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = tx.repetition_features(df).collect()[0]
    return {c: row[c] for c in COLS}


def test_empty_text_yields_zero_grams_null_fracs(spark):
    got = _feats(spark, "")
    assert got == {
        "n_2grams": 0,
        "n_3grams": 0,
        "dup_2gram_frac_e6": None,
        "dup_3gram_frac_e6": None,
        "top_2gram_frac_e6": None,
    }


def test_two_words_has_2grams_but_no_3grams(spark):
    got = _feats(spark, "alpha beta")
    assert got["n_2grams"] == 1
    assert got["n_3grams"] == 0
    assert got["dup_2gram_frac_e6"] == 0
    assert got["dup_3gram_frac_e6"] is None
    assert got["top_2gram_frac_e6"] == 1_000_000  # the one 2-gram is 100%


def test_fully_repeated_doc_saturates(spark):
    # "spam spam spam spam": 3 identical 2-grams, 2 identical 3-grams
    got = _feats(spark, "spam spam spam spam")
    assert got["n_2grams"] == 3
    assert got["n_3grams"] == 2
    assert got["dup_2gram_frac_e6"] == 666_666  # floor(2/3 * 1e6)
    assert got["dup_3gram_frac_e6"] == 500_000
    assert got["top_2gram_frac_e6"] == 1_000_000


def test_distinct_doc_is_repetition_free(spark):
    got = _feats(spark, "one two three four five")
    assert got["n_2grams"] == 4
    assert got["dup_2gram_frac_e6"] == 0
    assert got["dup_3gram_frac_e6"] == 0
    assert got["top_2gram_frac_e6"] == 250_000  # 1/4


def test_case_and_punctuation_normalize_into_words(spark):
    # "The the" → words ["the","the"]: one duplicated 2-gram pair? No —
    # a single 2-gram ("the the"), repeated zero times.
    got = _feats(spark, "The, the. THE!")
    assert got["n_2grams"] == 2  # ["the the", "the the"]
    assert got["dup_2gram_frac_e6"] == 500_000
    assert got["top_2gram_frac_e6"] == 1_000_000


def test_boilerplate_planted_vocabulary(spark):
    """Six docs share one planted 3-gram ('lorem ipsum dolor'); with
    min_docs=5 exactly that gram is boilerplate, and each doc's
    fraction counts it against the doc's own distinct-3-gram count."""
    rows = [(i, f"lorem ipsum dolor unique{i} tail{i}") for i in range(6)]
    rows += [(6, "entirely different words here"), (7, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    vocab = tx.boilerplate_ngrams(df, n=3, min_docs=5)
    assert [r["gram"] for r in vocab.collect()] == ["lorem ipsum dolor"]

    got = {
        r["doc_id"]: (r["n_grams"], r["n_bp"], r["bp_frac_e6"])
        for r in tx.boilerplate_fraction(df, n=3, min_docs=5).collect()
    }
    # planted docs: 3 distinct 3-grams each, 1 of them boilerplate
    for i in range(6):
        assert got[i] == (3, 1, 333_333)
    assert got[6] == (2, 0, 0)       # no boilerplate hits
    assert got[7] == (0, 0, None)    # gramless doc: NULL fraction
