"""Gopher-rules quality gate: each rule triggers on a crafted doc and
the conjunction admits a clean one. All-integer comparisons — no float
boundaries to chase."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import text as tx  # noqa: E402

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to town in "
    "the morning light while it is raining and that makes everything "
    "seem fresh and new again with many fine words to read here today "
    "plus more of these simple words that keep the counts in range"
)


def _gate(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r["doc_id"]: r for r in tx.gopher_gate(df).collect()}


def test_clean_doc_passes_everything(spark):
    out = _gate(spark, [(1, GOOD)])
    r = out[1]
    assert r["gopher_pass"]
    assert all(
        r[k]
        for k in (
            "r_word_count", "r_mean_wordlen", "r_symbol_ratio", "r_bullet",
            "r_ellipsis", "r_alpha_words", "r_stopwords",
        )
    )


def test_each_rule_fires_independently(spark):
    docs = [
        (1, "too short"),                                        # word count
        (2, " ".join(["pneumonoultramicroscopics"] * 60)),       # mean wordlen > 10
        (3, " ".join(["the", "is", "that"] + ["# word #"] * 40)),  # symbols
        (4, "\n".join(["- bullet line of the it is that"] * 10)),  # bullets
        (5, "\n".join(["the end is near..."] * 10)),             # ellipsis
        (6, "the is " + " ".join(str(n) for n in range(100))),   # alpha words
        (7, " ".join(["zumba"] * 80)),                           # stopwords
    ]
    out = _gate(spark, docs)
    assert not out[1]["r_word_count"]
    assert not out[2]["r_mean_wordlen"]
    assert not out[3]["r_symbol_ratio"]
    assert not out[4]["r_bullet"]
    assert not out[5]["r_ellipsis"]
    assert not out[6]["r_alpha_words"]
    assert not out[7]["r_stopwords"]
    assert not any(out[i]["gopher_pass"] for i in range(1, 8))


def test_counts_are_exact_integers(spark):
    text = "the cat...\n- item one\nplain line"
    out = _gate(spark, [(1, text)])
    r = out[1]
    assert r["n_lines"] == 3
    assert r["n_bullet_lines"] == 1
    assert r["n_ellipsis_lines"] == 1
    assert r["n_sym"] == 1
    assert r["n_words"] == 6  # the cat item one plain line
    assert r["n_alpha_words"] == 6  # "..." and "-" are not words
