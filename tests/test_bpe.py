"""Pins for distributed BPE training (text.bpe_*): the classic
Sennrich et al. 2016 example vocabulary, greedy-left-to-right merge
application, deterministic tie-breaking, and early stop."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import text as tx


def _vocab(spark, weighted):
    return spark.createDataFrame(
        [(t, c) for t, c in weighted.items()], "token string, cnt bigint"
    )


def test_classic_example_merge_sequence(spark):
    # Sennrich et al. 2016 §3.2 example: {'low':5,'lower':2,'newest':6,
    # 'widest':3}. Hand-derived with our deterministic (cnt desc,
    # pair asc) tie-break: es(9, 3-way tie with st/t</w>), est(9),
    # est</w>(9), lo(7, tie with ow), low(7), then ew(6, 3-way tie
    # with (n,e)/(w,est</w>) — 'e' sorts first).
    vocab = _vocab(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges, symtab = tx.bpe_train(vocab, n_merges=6)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]
    syms = {r.token: r.syms for r in symtab.collect()}
    assert syms["low"] == ["low", "</w>"]
    assert syms["newest"] == ["n", "ew", "est</w>"]
    assert syms["widest"] == ["w", "i", "d", "est</w>"]
    assert syms["lower"] == ["low", "e", "r", "</w>"]


def test_pair_counts_weighted_and_overlapping(spark):
    vocab = _vocab(spark, {"aaa": 2, "ab": 3})
    got = {
        (r.sym_a, r.sym_b): r.pair_cnt
        for r in tx.bpe_pair_counts(tx.bpe_symbols(vocab)).collect()
    }
    # 'aaa' contributes the overlapping (a,a) twice per occurrence
    assert got[("a", "a")] == 4
    assert got[("a", "b")] == 3
    assert got[("a", "</w>")] == 2
    assert got[("b", "</w>")] == 3


def test_merge_application_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a", "</w>"],)], "syms array<string>")
    out = df.select(
        tx._merge_pair_expr(F.col("syms"), "a", "a").alias("m")
    ).collect()[0]["m"]
    assert out == ["aa", "a", "</w>"]


def test_early_stop_when_no_pair_repeats(spark):
    vocab = _vocab(spark, {"ab": 1, "cd": 1})
    merges, _ = tx.bpe_train(vocab, n_merges=10)
    assert merges == []  # every pair occurs once -> nothing to merge


# --- bpe_encode (apply + fertility) ----------------------------------------


def test_encode_classic_example_counts(spark):
    # same corpus as the training pin, stated as documents
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest newest newest low")],
        "doc_id bigint, text string",
    )
    merges = [
        ("e", "s"), ("es", "t"), ("est", "</w>"),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]
    got = {r.doc_id: r for r in tx.bpe_encode(docs, merges).collect()}
    # segmentations (training pin): low -> [low,</w>]=2, lower ->
    # [low,e,r,</w>]=4, newest -> [n,ew,est</w>]=3, widest ->
    # [w,i,d,est</w>]=4
    assert (got[1].n_words, got[1].n_subtokens) == (3, 2 + 4 + 3)
    assert (got[2].n_words, got[2].n_subtokens) == (4, 4 + 3 + 3 + 2)
    assert got[1].fertility_e6 == (9 * 1_000_000) // 3
    assert got[2].fertility_e6 == 3_000_000


def test_encode_zero_merges_is_chars_plus_eow(spark):
    docs = spark.createDataFrame([(1, "ab abc ab")], "doc_id bigint, text string")
    got = tx.bpe_encode(docs, []).collect()[0]
    # ab -> [a,b,</w>]=3 (x2), abc -> [a,b,c,</w>]=4
    assert (got.n_words, got.n_subtokens) == (3, 3 + 3 + 4)


def test_encode_fertility_never_increases_with_more_merges(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog the end") for i in range(4)],
        "doc_id bigint, text string",
    )
    toks = docs.select(
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[A-Za-z0-9]+"), 0)).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    merges, _ = tx.bpe_train(vocab, n_merges=6)
    prev = None
    for m in range(0, len(merges) + 1, 2):
        tot = tx.bpe_encode(docs, merges[:m]).agg(F.sum("n_subtokens")).collect()[0][0]
        if prev is not None:
            assert tot <= prev
        prev = tot
