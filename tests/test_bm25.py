"""BM25 lexical retrieval (operators/text.py bm25_topk): exact-integer
fidelity pins — a pure-Python replica of the scaled-integer formula
must reproduce the operator's scores bit-for-bit; the fixed-point log2
must stay within its documented 0.0861-octave error bound; length
normalization and tf saturation must behave like BM25 (not TF-IDF).
"""

from __future__ import annotations

import math
import os
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import text as tx  # noqa: E402


def _log2lin_e3_py(x: int) -> int:
    e = x.bit_length() - 1
    return e * 1000 + ((x - (1 << e)) * 1000) // (1 << e)


def _bm25_py(docs: dict[int, str], qids: list[int], k: int = 5):
    """Pure-Python replica of the operator's integer arithmetic."""
    toks = {d: re.findall(r"[A-Za-z0-9]+", t.lower()) for d, t in docs.items()}
    tf = {
        (d, w): sum(1 for x in ws if x == w)
        for d, ws in toks.items()
        for w in set(ws)
    }
    dl = {d: len(ws) for d, ws in toks.items()}
    n = len(docs)
    avgdl_e3 = (sum(dl.values()) * 1000) // n
    df: dict[str, int] = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    idf = {}
    for w, dfx in df.items():
        ratio_e6 = ((2 * n - 2 * dfx + 1) * 1000000) // (2 * dfx + 1) + 1000000
        idf[w] = _log2lin_e3_py(ratio_e6) - 19907
    scores: dict[tuple[int, int], int] = {}
    for q in qids:
        for d in docs:
            if d == q:
                continue
            s = 0
            for w in set(toks[q]):
                if (d, w) not in tf:
                    continue
                t = tf[(d, w)]
                l_e3 = (dl[d] * 1000000) // avgdl_e3
                den_e5 = t * 100000 + 120 * (250 + (75 * l_e3) // 100)
                sat_e3 = (t * 220 * 1000000) // den_e5
                s += tf[(q, w)] * idf[w] * sat_e3
            if s != 0 or any((d, w) in tf for w in set(toks[q])):
                scores[(q, d)] = s
    out = {}
    for q in qids:
        cands = sorted(
            ((s, d) for (qq, d), s in scores.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [(d, s, r + 1) for r, (s, d) in enumerate(cands[:k])]
    return out


def test_log2lin_error_bound(spark):
    vals = [2**i + j for i in range(1, 40) for j in (0, 1, 7)] + [
        1000000, 123456789, 3, 999999999999
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {
        r.v: r.l
        for r in df.selectExpr(
            "v", f"{tx._log2lin_e3('v')} as l"
        ).collect()
    }
    for v in vals:
        assert got[v] == _log2lin_e3_py(v)
        # 0.0861 analytic interpolation max + 1e-3 fixed-point floor
        assert abs(got[v] / 1000.0 - math.log2(v)) <= 0.0872


def test_bm25_matches_pure_python_replica(spark):
    docs = {
        0: "zebra quark common common words here",
        1: "zebra quark common filler filler filler filler filler",
        2: "zebra common",
        3: "common words words words",
        4: "quark quark quark quark quark quark quark quark",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    qs = df.filter(F.col("doc_id") == 0)
    got = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in tx.bm25_topk(df, qs, k=5).collect()
    }
    want = _bm25_py(docs, [0], k=5)
    assert got == {(0, d): (s, r) for d, s, r in want[0]}


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf of the query term; the longer doc is penalized (b > 0)
    df = spark.createDataFrame(
        [
            (0, "zebra"),
            (1, "zebra pad"),
            (2, "zebra pad pad pad pad pad pad pad pad pad pad pad"),
        ],
        "doc_id bigint, text string",
    )
    qs = df.filter(F.col("doc_id") == 0)
    got = {r.doc_id: r.rank for r in tx.bm25_topk(df, qs, k=2).collect()}
    assert got[1] == 1 and got[2] == 2


def test_bm25_tf_saturation_bounded(spark):
    # tf=12 of the term scores < (k1+1)x the tf=1 doc — saturation,
    # where raw TF-IDF would scale ~12x
    df = spark.createDataFrame(
        [
            (0, "zebra"),
            (1, "zebra " * 12),
            (2, "zebra"),
        ],
        "doc_id bigint, text string",
    )
    qs = df.filter(F.col("doc_id") == 0)
    rows = {r.doc_id: r.score for r in tx.bm25_topk(df, qs, k=2).collect()}
    assert rows[1] > rows[2]  # more tf still wins...
    assert rows[1] < rows[2] * 2.2 * 1.2  # ...but saturated, not linear


def test_bm25_stop_list_cap(spark):
    df = spark.createDataFrame(
        [
            (0, "zebra common"),
            (1, "zebra common"),
            (2, "common"),
            (3, "common"),
        ],
        "doc_id bigint, text string",
    )
    qs = df.filter(F.col("doc_id") == 0)
    got = {
        r.doc_id
        for r in tx.bm25_topk(df, qs, k=4, max_df_fraction=0.5).collect()
    }
    assert got == {1}


# --- token entropy (shares the fixed-point log2 machinery) ------------------


def test_token_entropy_uniform_vs_degenerate(spark):
    # degenerate: one token type -> H = 0; uniform over 4 types -> ~2 bits
    df = spark.createDataFrame(
        [
            (1, "aa aa aa aa aa aa aa aa", "flat"),
            (2, "w x y z w x y z", "uni"),
        ],
        "doc_id bigint, text string, source string",
    )
    got = {r.source: r for r in tx.token_entropy(df).collect()}
    assert got["flat"].entropy_e3 == 0
    assert got["flat"].n_types == 1 and got["flat"].n_tokens == 8
    assert got["uni"].n_types == 4 and got["uni"].n_tokens == 8
    # uniform over 4: exactly 2 bits, and log2lin is exact at powers of 2
    assert got["uni"].entropy_e3 == 2000


def test_token_entropy_matches_fixed_point_replica(spark):
    texts = {
        "a": ["the cat sat on the mat", "the dog sat"],
        "b": ["one two three four five six seven"],
    }
    rows = [
        (i, t, s) for s, ts in texts.items() for i, t in enumerate(ts)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {r.source: r.entropy_e3 for r in tx.token_entropy(df).collect()}

    import re
    from collections import Counter

    for s, ts in texts.items():
        c = Counter(w for t in ts for w in re.findall(r"[A-Za-z0-9]+", t.lower()))
        tt = sum(c.values())
        want = sum(v * (_log2lin_e3_py(tt) - _log2lin_e3_py(v)) for v in c.values()) // tt
        assert got[s] == want


def test_hybrid_fusion_with_bm25_arm(spark):
    """rrf_fuse accepts the BM25 arm exactly like the TF-IDF arm —
    the 3-arm hybrid (dense + LSH + BM25) stays deterministic."""
    from pyspark.sql import functions as F

    from spark_cassandra_collabfiltering_spark.operators import similarity as sim
    from spark_cassandra_collabfiltering_spark.plans.queries import t as t_

    sf = "/root/testdata/sf0.001"
    emb = t_(spark, sf, "embeddings")
    docs = t_(spark, sf, "documents")
    qids = [0, 1, 2]
    qs = sim.make_queries(emb, qids)
    dense = sim.cosine_topk_bruteforce(emb, qs, k=5)
    lsh = sim.cosine_topk_lsh(emb, qs, k=5, bits=8)
    lex = tx.bm25_topk(
        docs, docs.filter(F.col("doc_id").isin(qids)), k=5
    ).withColumnRenamed("doc_id", "vec_id")
    fused = sim.rrf_fuse([dense, lsh, lex], topk=5)
    rows = fused.collect()
    assert {r.query_id for r in rows} == set(qids)
    for q in qids:
        ranked = sorted(
            (r for r in rows if r.query_id == q), key=lambda r: r.fused_rank
        )
        assert [r.fused_rank for r in ranked] == [1, 2, 3, 4, 5]
        assert all(1 <= r.n_arms <= 3 for r in ranked)
    again = {
        (r.query_id, r.vec_id, r.fused_rank)
        for r in sim.rrf_fuse([dense, lsh, lex], topk=5).collect()
    }
    assert again == {(r.query_id, r.vec_id, r.fused_rank) for r in rows}
