"""Count-based text models (ml/textmodels.py): exact-integer fidelity
pins. A pure-Python replica of the fixed-point Naive Bayes and bigram
LM arithmetic must reproduce the operators' scores bit-for-bit on a
hand-built corpus; classifier behavior (separable classes learned,
ties broken by label order, OOV smoothing floor) and LM behavior
(reference-slice docs score lower than gibberish, unseen contexts hit
the L(V) ceiling) are pinned on planted fixtures.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.ml import textmodels as tm  # noqa: E402


def _l2l(x: int) -> int:
    e = x.bit_length() - 1
    return e * 1000 + ((x - (1 << e)) * 1000) // (1 << e)


def _bucket(key: int, buckets: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % buckets


def _toks(t: str) -> list[str]:
    return re.findall(r"[A-Za-z0-9]+", t.lower())


def _nb_py(rows, train_buckets=2, train_bucket=0):
    """Pure-Python replica of nb_classify's integer arithmetic."""
    train = [r for r in rows if _bucket(r[0], train_buckets) == train_bucket]
    test = [r for r in rows if _bucket(r[0], train_buckets) != train_bucket]
    counts: dict[tuple[str, str], int] = {}
    t_y: dict[str, int] = {}
    n_docs_y: dict[str, int] = {}
    for _, lab, txt in train:
        n_docs_y[lab] = n_docs_y.get(lab, 0) + 1
        for w in _toks(txt):
            counts[(lab, w)] = counts.get((lab, w), 0) + 1
            t_y[lab] = t_y.get(lab, 0) + 1
    vocab = {w for (_, w) in counts}
    v, n = len(vocab), len(train)
    labels = sorted(n_docs_y)
    out = {}
    for did, lab, txt in test:
        ws = _toks(txt)
        best = None
        for y in labels:
            prior = _l2l(n_docs_y[y]) - _l2l(n)
            default = -_l2l(t_y.get(y, 0) + v)
            s = prior
            for w in ws:
                if w in vocab:
                    s += _l2l(counts.get((y, w), 0) + 1) - _l2l(t_y.get(y, 0) + v)
                else:
                    s += default
            if best is None or s > best[1]:
                best = (y, s)
        out[did] = (lab, best[0], best[1])
    return out


def _lm_py(rows, train_langs):
    """Pure-Python replica of bigram_lm_xent's integer arithmetic."""
    c_uv: dict[tuple[str, str], int] = {}
    vocab: set[str] = set()
    for _, lab, txt in rows:
        if lab not in train_langs:
            continue
        ws = _toks(txt)
        for i, w in enumerate(ws):
            prev = "<s>" if i == 0 else ws[i - 1]
            c_uv[(prev, w)] = c_uv.get((prev, w), 0) + 1
            vocab.add(w)
    c_u: dict[str, int] = {}
    for (u, _), c in c_uv.items():
        c_u[u] = c_u.get(u, 0) + c
    v = len(vocab) + 1
    out = {}
    for did, _, txt in rows:
        ws = _toks(txt)
        if not ws:
            continue
        s = 0
        for i, w in enumerate(ws):
            prev = "<s>" if i == 0 else ws[i - 1]
            s += _l2l(c_u.get(prev, 0) + v) - _l2l(c_uv.get((prev, w), 0) + 1)
        out[did] = (len(ws), s // len(ws))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


CORPUS = [
    # two separable classes: "cat"-heavy vs "dog"-heavy vocabulary,
    # enough rows that both md5 split buckets hold both classes.
    (1, "a", "cat cat purr whiskers cat nap"),
    (2, "a", "purr cat whiskers cat"),
    (3, "a", "whiskers nap cat purr purr"),
    (4, "a", "cat purr nap nap"),
    (5, "b", "dog bark dog fetch bone"),
    (6, "b", "bark bone dog fetch"),
    (7, "b", "fetch dog bark bone bone"),
    (8, "b", "dog bone fetch bark dog"),
    (9, "a", "cat whiskers purr"),
    (10, "b", "bark fetch bone dog"),
    (11, "a", "nap cat cat whiskers"),
    (12, "b", "bone dog bark fetch fetch"),
]


def test_nb_matches_python_replica_bit_for_bit(spark):
    got = {
        r.doc_id: (r.actual, r.predicted, r.score_e3)
        for r in tm.nb_classify(_docs(spark, CORPUS), label_col="lang").collect()
    }
    assert got == _nb_py(CORPUS)


def test_nb_learns_separable_classes(spark):
    pred = tm.nb_classify(_docs(spark, CORPUS), label_col="lang").collect()
    assert len(pred) > 0
    assert all(r.predicted == r.actual for r in pred)


def test_nb_confusion_counts(spark):
    cm = {
        (r.actual, r.predicted): r.n_docs
        for r in tm.nb_confusion(_docs(spark, CORPUS), label_col="lang").collect()
    }
    rep = _nb_py(CORPUS)
    exp: dict[tuple[str, str], int] = {}
    for a, p, _ in rep.values():
        exp[(a, p)] = exp.get((a, p), 0) + 1
    assert cm == exp


def test_nb_oov_doc_falls_back_to_prior_plus_floor(spark):
    # doc 13 is entirely OOV: score(y) = prior + S_d * default(y);
    # with equal priors the label with MORE train tokens (bigger
    # T_y + V denominator) loses, and ties break on label asc.
    rows = CORPUS + [(13, "a", "zzz qqq xxx")]
    got = {r.doc_id: r for r in tm.nb_classify(_docs(spark, rows)).collect()}
    if 13 in got:  # only if 13 lands in the test split (it does: md5)
        rep = _nb_py(rows)
        assert (got[13].predicted, got[13].score_e3) == rep[13][1:]


def test_lm_matches_python_replica_bit_for_bit(spark):
    got = {
        r.doc_id: (r.n_bigrams, r.xent_e3)
        for r in tm.bigram_lm_xent(
            _docs(spark, CORPUS), F.col("lang") == "a"
        ).collect()
    }
    assert got == _lm_py(CORPUS, {"a"})


def test_lm_scores_reference_slice_below_gibberish(spark):
    rows = CORPUS + [(14, "x", "zxq vbn mlk jhg fds qwe rty uio")]
    x = {
        r.doc_id: r.xent_e3
        for r in tm.bigram_lm_xent(_docs(spark, rows), F.col("lang") == "a").collect()
    }
    in_slice = max(x[d] for d, lab, _ in CORPUS if lab == "a")
    assert x[14] > in_slice  # gibberish far above every reference doc


def test_lm_unseen_context_costs_l_of_v(spark):
    # a doc whose every bigram has an unseen context pays exactly
    # L(V) per bigram (c_u = 0, c_uv = 0).
    rows = [(1, "a", "aa bb cc"), (2, "x", "zz zz zz")]
    x = {
        r.doc_id: (r.n_bigrams, r.xent_e3)
        for r in tm.bigram_lm_xent(_docs(spark, rows), F.col("lang") == "a").collect()
    }
    v = 3 + 1
    # doc 2: bigrams (<s>,zz),(zz,zz),(zz,zz): context <s> IS seen
    # (c_u=1); contexts zz unseen. nlp = [L(1+4)-L(0+1), L(4)-L(1), L(4)]
    exp = (_l2l(5) + _l2l(4) + _l2l(4)) // 3
    assert x[2] == (3, exp)


def test_lm_empty_and_null_docs_dropped(spark):
    rows = [(1, "a", "aa bb"), (2, "a", ""), (3, "a", "??!!")]
    x = tm.bigram_lm_xent(_docs(spark, rows), F.col("lang") == "a").collect()
    assert {r.doc_id for r in x} == {1}


def test_compression_ratio_orders_repetitive_below_random(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    # doc 3 must be genuinely non-repeating (a repeated "random" block
    # compresses BETTER than prose — zlib finds the period): derive an
    # incompressible-ish stream from chained md5 hex.
    noise = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(60)
    )
    rows = [
        (1, "x", "ab " * 500),                      # highly repetitive
        (2, "x", "the quick brown fox jumps over the lazy dog. " * 30),
        (3, "x", noise),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r.doc_id: r for r in tx.compression_ratio(df).collect()}
    assert got[1].ratio_e6 < got[2].ratio_e6 < got[3].ratio_e6
    assert got[1].n_bytes == 1500
    # deterministic across runs
    again = {r.doc_id: r.ratio_e6 for r in tx.compression_ratio(df).collect()}
    assert again == {k: v.ratio_e6 for k, v in got.items()}


def test_compression_ratio_empty_and_null(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "x", ""), (2, "x", None)], ["doc_id", "lang", "text"]
    )
    got = {r.doc_id: r for r in tx.compression_ratio(df).collect()}
    assert got[1].n_bytes == 0 and got[1].ratio_e6 >= 0
    assert got[2].n_bytes == 0


def _nb_scores_py(rows, pos, train_buckets=2, train_bucket=0):
    """Held-out one-vs-rest MARGIN scores for class ``pos`` (same
    integer arithmetic as _nb_py; margin = pos minus best other)."""
    train = [r for r in rows if _bucket(r[0], train_buckets) == train_bucket]
    test = [r for r in rows if _bucket(r[0], train_buckets) != train_bucket]
    counts: dict[tuple[str, str], int] = {}
    t_y: dict[str, int] = {}
    n_docs_y: dict[str, int] = {}
    for _, lab, txt in train:
        n_docs_y[lab] = n_docs_y.get(lab, 0) + 1
        for w in _toks(txt):
            counts[(lab, w)] = counts.get((lab, w), 0) + 1
            t_y[lab] = t_y.get(lab, 0) + 1
    vocab = {w for (_, w) in counts}
    v, n = len(vocab), len(train)
    labels = sorted(n_docs_y)
    out = []
    for did, lab, txt in test:
        sc = {}
        for y in labels:
            prior = _l2l(n_docs_y[y]) - _l2l(n)
            default = -_l2l(t_y.get(y, 0) + v)
            s = prior
            for w in _toks(txt):
                if w in vocab:
                    s += _l2l(counts.get((y, w), 0) + 1) - _l2l(t_y.get(y, 0) + v)
                else:
                    s += default
            sc[y] = s
        margin = sc[pos] - max(s for y, s in sc.items() if y != pos)
        out.append((1 if lab == pos else 0, margin))
    return out


def _auc_e6_bruteforce(scored):
    """AUC by enumerating every (pos, neg) pair; ties count half.
    Returns (n_pos, n_neg, auc_e6) with the same integral rounding."""
    pos = [s for p, s in scored if p]
    neg = [s for p, s in scored if not p]
    u2 = sum(2 if sp > sn else (1 if sp == sn else 0) for sp in pos for sn in neg)
    return len(pos), len(neg), u2 * 1000000 // (2 * len(pos) * len(neg))


def test_nb_auc_matches_bruteforce_pairs(spark):
    """Engine AUC row == brute-force pair enumeration over the
    pure-Python replica's scores (exact, including the integral-div
    rounding) — proves the grouped two-level U2 equals the O(n²)
    definition."""
    got = tm.nb_binary_auc(_docs(spark, CORPUS), pos_label="a").collect()
    assert len(got) == 1
    r = got[0]
    want = _auc_e6_bruteforce(_nb_scores_py(CORPUS, "a"))
    assert (r.n_pos, r.n_neg, r.auc_e6) == want


def test_nb_auc_separable_corpus_is_one(spark):
    r = tm.nb_binary_auc(_docs(spark, CORPUS), pos_label="a").first()
    assert r.auc_e6 == 1000000


def test_nb_auc_ties_count_half(spark):
    """Identical texts under both labels force score ties; a corpus
    that is ONLY ties must score exactly 0.5."""
    rows = []
    for i in range(8):
        rows.append((2 * i + 1, "a", "the same words every time"))
        rows.append((2 * i + 2, "b", "the same words every time"))
    r = tm.nb_binary_auc(_docs(spark, rows), pos_label="a").first()
    want = _auc_e6_bruteforce(_nb_scores_py(rows, "a"))
    assert (r.n_pos, r.n_neg, r.auc_e6) == want
    assert r.auc_e6 == 500000


# ---------------------------------------------------------------------------
# r6: grouped in-plan LM training (one model per source)
# ---------------------------------------------------------------------------

def test_grouped_lm_flags_within_source_outlier(spark):
    from spark_cassandra_collabfiltering_spark.ml import textmodels as tm

    # source A: templated English; source B: templated German. The
    # planted outlier is a GERMAN doc filed under source A — its
    # bigrams are unseen by A's model, so its xent must top source A.
    rows = [(f"a{i}", "A", "the quick brown fox jumps over the lazy dog")
            for i in range(10)]
    rows += [(f"b{i}", "B", "der schnelle braune fuchs springt hoch")
             for i in range(10)]
    rows.append(("odd", "A", "der schnelle braune fuchs springt hoch"))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in tm.bigram_lm_xent_grouped(docs).collect()}
    a_scores = {d: r["xent_e3"] for d, r in out.items() if r["source"] == "A"}
    assert max(a_scores, key=a_scores.get) == "odd"
    # the same text is TYPICAL of source B — scored there it is cheap
    assert out["odd"]["xent_e3"] > out["b0"]["xent_e3"]


def test_grouped_lm_matches_global_lm_on_single_group(spark):
    # with one group, the grouped trainer must equal the global LM
    # trained on the full frame (train_filter = everything)
    from pyspark.sql import functions as F
    from spark_cassandra_collabfiltering_spark.ml import textmodels as tm

    rows = [(f"d{i}", "only", f"alpha beta gamma delta {'epsilon ' * (i % 3)}")
            for i in range(12)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    grouped = {
        r["doc_id"]: (r["n_bigrams"], r["xent_e3"])
        for r in tm.bigram_lm_xent_grouped(docs).collect()
    }
    glob = {
        r["doc_id"]: (r["n_bigrams"], r["xent_e3"])
        for r in tm.bigram_lm_xent(docs, F.lit(True)).collect()
    }
    assert grouped == glob
