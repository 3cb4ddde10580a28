"""Planted-corpus pins for dedup.duplicate_spans (exact-substring
dedup, Lee et al. 2022 shape): span boundaries, overlap/adjacent
merging, gap splitting, and the min_docs cross-doc requirement.
"""

from __future__ import annotations

from spark_cassandra_collabfiltering_spark.operators import dedup as dd


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(spark, rows, n=4, min_docs=2):
    out = dd.duplicate_spans(
        _corpus(spark, rows), "doc_id", "text", n=n, min_docs=min_docs
    )
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_dup_grams)
        for r in out.collect()
    }


def test_shared_span_exact_boundaries(spark):
    # docs 1 and 2 share words 0..5 ("the quick brown fox jumps high");
    # with n=4 the shared 4-grams anchor at 0,1,2 in doc 1 and the
    # merged span covers word positions 0..5 in both docs.
    shared = "the quick brown fox jumps high"
    rows = [
        (1, shared + " alpha beta gamma delta"),
        (2, shared + " zeta eta theta iota"),
    ]
    got = _spans(spark, rows)
    assert got == {(1, 0, 5, 6, 3), (2, 0, 5, 6, 3)}


def test_no_span_below_n(spark):
    # only a 3-word overlap -> no shared 4-gram -> no spans at all
    rows = [
        (1, "one two three alpha beta gamma delta"),
        (2, "one two three zeta eta theta iota"),
    ]
    assert _spans(spark, rows) == set()


def test_single_doc_repetition_not_cross_doc(spark):
    # a doc repeating its own 4-gram is NOT a cross-doc duplicate
    rows = [
        (1, "a b c d x y z a b c d"),
        (2, "entirely different words here now"),
    ]
    assert _spans(spark, rows) == set()


def test_gap_splits_spans(spark):
    # doc 3 contains the shared prefix AND the shared suffix of doc 4,
    # separated by unique filler wider than one position -> two
    # distinct maximal spans in both docs.
    pre = "aa bb cc dd"
    suf = "ww xx yy zz"
    rows = [
        (3, f"{pre} only three filler words {suf}"),
        (4, f"{pre} unrelated middle portion q {suf}"),
    ]
    got = _spans(spark, rows)
    # both docs: words 0..3 and 8..11 (4-word unique middles -> split)
    assert (3, 0, 3, 4, 1) in got
    assert (3, 8, 11, 4, 1) in got
    assert (4, 0, 3, 4, 1) in got
    assert (4, 8, 11, 4, 1) in got
    assert len(got) == 4


def test_adjacent_grams_merge(spark):
    # three docs pairwise share different but ADJACENT grams with doc
    # 1: doc 2 shares words 0..3, doc 3 shares words 4..7 of doc 1.
    # In doc 1 the two duplicated regions touch (3+1 == 4) and merge
    # into one maximal span 0..7.
    rows = [
        (1, "p q r s t u v w"),
        (2, "p q r s mm nn oo pp"),
        (3, "kk ll mm nn2 t u v w"),
    ]
    got = _spans(spark, rows)
    assert (1, 0, 7, 8, 2) in got


def test_min_docs_threshold(spark):
    shared = "one common phrase across many docs"
    rows = [(i, f"{shared} unique tail {i} filler") for i in range(1, 4)]
    # with min_docs=4 nothing qualifies (only 3 docs share the gram)
    assert _spans(spark, rows, min_docs=4) == set()
    # with min_docs=3 every doc reports the shared span: "unique tail"
    # is also common to all three docs, so shared 4-grams anchor at
    # positions 0..4 and the maximal span covers words 0..7.
    got = _spans(spark, rows, min_docs=3)
    assert {(d, s, e) for (d, s, e, _, _) in got} == {
        (1, 0, 7), (2, 0, 7), (3, 0, 7)
    }


def test_keep_best_counts_unscored_members(spark):
    """LEFT-join semantics: a cluster member missing from the score
    table still counts in n_members and loses to any scored member;
    an entirely unscored cluster keeps its smallest id instead of
    vanishing."""
    clusters = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (20, 2), (21, 2)],
        "node bigint, cluster_id bigint",
    )
    scores = spark.createDataFrame(
        [(10, 100), (11, 300)], "doc_id bigint, quality_e6 bigint"
    )  # 12 unscored; cluster 2 fully unscored
    got = {
        r.cluster_id: (r.keep_id, r.keep_score, r.n_members)
        for r in dd.keep_best_scored(clusters, scores).collect()
    }
    assert got[1] == (11, 300, 3)   # n_members counts the unscored 12
    assert got[2] == (20, None, 2)  # unscored cluster survives, min id


def test_remove_spans_strips_exactly_the_intervals(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z")], "doc_id bigint, text string"
    )
    spans = spark.createDataFrame(
        [(1, 1, 2), (1, 5, 6)], "doc_id bigint, span_start bigint, span_end bigint"
    )
    import hashlib

    got = {r.doc_id: r for r in dd.remove_spans(docs, spans).collect()}
    # doc 1: drop positions 1-2 (b c) and 5-6 (f g) -> "a d e h"
    assert (got[1].n_tokens, got[1].n_tokens_kept) == (8, 4)
    assert got[1].kept_md5 == hashlib.md5(b"a d e h").hexdigest()
    # doc 2: untouched (no spans)
    assert (got[2].n_tokens, got[2].n_tokens_kept) == (3, 3)
    assert got[2].kept_md5 == hashlib.md5(b"x y z").hexdigest()


def test_remove_spans_whole_doc(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    spans = spark.createDataFrame(
        [(1, 0, 1)], "doc_id bigint, span_start bigint, span_end bigint"
    )
    import hashlib

    r = dd.remove_spans(docs, spans).collect()[0]
    assert (r.n_tokens, r.n_tokens_kept) == (2, 0)
    assert r.kept_md5 == hashlib.md5(b"").hexdigest()


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc fully quoted inside a much longer one: containment
    of the short side ~1e6 while Jaccard stays below any useful
    threshold."""
    quote = "abcdefghijklmnop"          # 13 4-gram shingles
    # non-repeating numeric filler -> hundreds of DISTINCT shingles
    filler = "".join(f"{i:03d}" for i in range(100, 250))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + quote + filler)],
        "doc_id bigint, text string",
    )
    out = dd.containment_pairs(
        docs, "doc_id", "text", n=4, threshold_e6=900_000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.cont_a_e6 == 1_000_000      # quote fully contained
    assert r.cont_b_e6 < 400_000         # long side barely overlaps
    jac = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=4, threshold=0.4
    ).collect()
    assert jac == []                     # Jaccard misses the pair


def test_hot_gram_cap_excludes_boilerplate(spark):
    """max_docs_per_gram: a gram shared by (almost) every doc is
    boilerplate and must not anchor spans when the cap is set; a
    2-doc duplicate still does."""
    footer = "all rights reserved by the example corp"
    rows = [(i, f"unique{i} words number {i} here {footer}") for i in range(1, 6)]
    rows.append((10, "shared pair text one two three four alpha"))
    rows.append((11, "shared pair text one two three four beta"))
    uncapped = _spans(spark, rows, n=4, min_docs=2)
    capped = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_dup_grams)
        for r in dd.duplicate_spans(
            _corpus(spark, rows), "doc_id", "text",
            n=4, min_docs=2, max_docs_per_gram=3,
        ).collect()
    }
    # uncapped sees the 5-doc footer; capped drops it
    assert any(d in range(1, 6) for d, *_ in uncapped)
    assert not any(d in range(1, 6) for d, *_ in capped)
    # the 2-doc genuine duplicate survives the cap
    assert any(d in (10, 11) for d, *_ in capped)


def test_ppjoin_equals_quadratic_baseline_and_prunes(spark):
    """PPJoin's exact-equality contract: identical pairs to the
    quadratic all-pairs join on a planted corpus (no recall loss),
    while its prefix-filtered candidate join touches FEWER candidate
    pairs than all-pairs (the point of the algorithm)."""
    import pyspark.sql.functions as F

    from spark_cassandra_collabfiltering_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog near the river bank today "
    alt = "completely different content about compilers and register allocation "
    rows = [
        (1, base + "alpha"),
        (2, base + "bravo"),
        (3, alt + "one"),
        (4, alt + "two"),
        (5, "third topic entirely about ocean currents and tidal patterns"),
        (6, base + "charlie"),
    ]
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
    assert {(a, b) for a, b, _ in got} >= {(1, 2), (1, 6), (2, 6), (3, 4)}
    # pruning is real: prefix candidates < all-pairs candidates.
    # (re-derive the candidate count the same way the operator does)
    n_docs = df.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    got_pairs = len(got)
    assert got_pairs < all_pairs


def test_ppjoin_tiered_verify_mid_tier_and_cold_only(spark):
    """r7 tiered verify: results are identical across tier layouts.
    hot_min_df=0 + tiny cap forces grams into the MID (cap-overflow
    explode) tier; a huge hot_min_df forces everything COLD; the
    default layout puts the planted corpus's common grams HOT. All
    three must equal the quadratic baseline exactly."""
    from spark_cassandra_collabfiltering_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog near the river bank today "
    alt = "completely different content about compilers and register allocation "
    rows = [
        (1, base + "alpha"), (2, base + "bravo"), (3, alt + "one"),
        (4, alt + "two"), (5, "third topic entirely about ocean currents"),
        (6, base + "charlie"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dd.ngram_jaccard_pairs(df, "doc_id", "text", n=4, threshold=0.4).collect()
    )
    for kw in (
        {"hot_min_df": 0, "hot_vocab_cap": 4},      # mid tier active
        {"hot_min_df": 10**6},                       # all cold
        {"hot_min_df": 1, "hot_vocab_cap": 4096},    # nearly all hot
    ):
        got = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dd.ppjoin_pairs(
                df, "doc_id", "text", n=4, threshold=0.4, **kw
            ).collect()
        )
        assert got == want, kw


# ---------------------------------------------------------------------------
# r6: the hashed-gram rewrite == a pure-Python string-gram replica, on
# RANDOM corpora (hypothesis) — pins the dual-xxhash64 key change
# ---------------------------------------------------------------------------

def _py_duplicate_spans(docs, n=3, min_docs=2):
    """Reference implementation over STRING grams (the pre-r6
    semantics): maximal merged spans of word n-grams shared by >=
    min_docs distinct docs."""
    import re as _re

    grams = {}
    tok = {d: _re.findall(r"[A-Za-z0-9]+", t.lower()) for d, t in docs}
    for d, ws in tok.items():
        for i in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[i : i + n]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = []
    for d, ws in tok.items():
        hits = sorted(
            i for i in range(len(ws) - n + 1) if tuple(ws[i : i + n]) in dup
        )
        span = None
        for i in hits:
            if span and i <= span[1] + 1:
                span = (span[0], max(span[1], i + n - 1), span[2] + 1)
            else:
                if span:
                    out.append((d, *span))
                span = (i, i + n - 1, 1)
        if span:
            out.append((d, *span))
    return {(d, s, e, c) for d, s, e, c in out}


def test_hashed_grams_equal_string_replica_random(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["aa", "bb", "cc", "dd"]
    doc_strat = st.lists(
        st.sampled_from(vocab), min_size=0, max_size=12
    ).map(" ".join)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(st.lists(doc_strat, min_size=2, max_size=6))
    def check(texts):
        docs = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
            for r in dd.duplicate_spans(
                df, "doc_id", "text", n=3, min_docs=2
            ).collect()
        }
        assert got == _py_duplicate_spans(docs, n=3, min_docs=2)

    check()
