"""Product-quantization tests.

PQ is rows-only for the oracle (k-means inside), so correctness is
pinned here instead:

1. an EXACTNESS invariant — on a corpus whose per-subspace subvectors
   come from a vocabulary of exactly n_codes points, k-means recovers
   the vocabulary, reconstruction is lossless, and ADC top-k must
   equal brute-force top-k bit-for-bit;
2. recall bounds on the real embeddings corpus, where uniform random
   vectors are PQ's adversarial case and the exact re-rank stage is
   what recovers quality.
"""

from __future__ import annotations

import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import similarity as sim  # noqa: E402
from spark_cassandra_collabfiltering_spark.plans.queries import t  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402

K = 5
QUERY_IDS = [0, 1, 2, 3, 4]


def _pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def _vocab_corpus(spark, m=4, sub_d=2, n_codes=4, n_rows=48):
    """Each subspace subvector drawn from a well-separated vocabulary
    of exactly n_codes points → PQ can encode losslessly."""
    vocab = {
        s: [
            [float(100 * s + 10 * c + j) for j in range(sub_d)]
            for c in range(n_codes)
        ]
        for s in range(m)
    }
    rows = []
    for i in range(n_rows):
        vec = []
        for s in range(m):
            vec += vocab[s][(i * 7 + 3 * s) % n_codes]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.mark.slow
def test_pq_lossless_on_vocabulary_corpus(spark):
    corpus = _vocab_corpus(spark)
    qs = sim.make_queries(corpus, [0, 1, 2])
    exact = sim.cosine_topk_bruteforce(corpus, qs, k=3)
    adc = sim.cosine_topk_pq(corpus, qs, k=3, m=4, n_codes=4)
    want = {(r["query_id"], r["vec_id"]): r["cos"] for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]): r["cos"] for r in adc.collect()}
    # lossless codes → identical scores AND identical top-k membership
    assert got == want


@pytest.mark.slow
def test_pq_codes_compress_to_m_ints(spark):
    corpus = _vocab_corpus(spark)
    codes, codebook = sim.pq_index(corpus, m=4, n_codes=4)
    row = codes.first()
    assert len(row["codes"]) == 4
    assert codebook.count() == 4 * 4
    assert codes.count() == corpus.count()


def test_pq_rerank_recovers_recall_on_real_corpus(spark):
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, QUERY_IDS)
    exact = _pairs(sim.cosine_topk_bruteforce(emb, qs, k=K))
    # train_fraction=0.25 exercises the 100 TB mode: codebooks fit on a
    # deterministic quarter sample, full corpus still encoded/reranked
    reranked = sim.cosine_topk_pq(
        emb, qs, k=K, m=8, n_codes=16, rerank=50, seed=42, train_fraction=0.25
    )
    rows = reranked.collect()
    # output contract: k ranked rows per query, ranks 1..k
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == set(QUERY_IDS)
    assert all(sorted(v) == list(range(1, K + 1)) for v in by_q.values())
    # a 10%-of-corpus exact re-rank must recover most true neighbors
    # (measured 0.8 at this seed; bound left loose for robustness)
    recall = len(_pairs(reranked) & exact) / len(exact)
    assert recall >= 0.5, recall


def test_ivfpq_composed_recall(spark):
    """IVF+PQ: probe pruning + residual-ADC shortlist + exact re-rank
    must recover most true neighbors while only ever ranking inside
    probed clusters. (Residual PQ quantizes better than raw PQ — the
    coarse structure is removed — so the same codebook budget gets a
    usable shortlist.)"""
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, QUERY_IDS)
    exact = _pairs(sim.cosine_topk_bruteforce(emb, qs, k=K))
    got = sim.cosine_topk_ivfpq(
        emb, qs, k=K, n_clusters=8, n_probe=4, m=8, n_codes=16,
        rerank=50, seed=42, train_fraction=0.25,
    )
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == set(QUERY_IDS)
    assert all(sorted(v) == list(range(1, K + 1)) for v in by_q.values())
    recall = len(_pairs(got) & exact) / len(exact)
    # half the clusters probed + 10% exact re-rank: most of top-k
    assert recall >= 0.4, recall


def test_training_sample_is_deterministic_and_validated(spark):
    import pytest

    corpus = _vocab_corpus(spark)
    s1 = sim._training_sample(corpus, "vec_id", 0.5)
    s2 = sim._training_sample(corpus, "vec_id", 0.5)
    ids1 = sorted(r["vec_id"] for r in s1.collect())
    assert ids1 == sorted(r["vec_id"] for r in s2.collect())  # keyed, not RNG
    assert 0 < len(ids1) < corpus.count()
    # fraction 1.0 / None are identity (full-corpus training)
    assert sim._training_sample(corpus, "vec_id", None) is corpus
    assert sim._training_sample(corpus, "vec_id", 1.0) is corpus
    with pytest.raises(ValueError):
        sim._training_sample(corpus, "vec_id", 0.0)
    with pytest.raises(ValueError):
        sim._training_sample(corpus, "vec_id", -0.2)


def test_probe_dim_empty_corpus_raises_clearly(spark):
    import pytest

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    qs = spark.createDataFrame(
        [(0, [1.0] * 8)], "query_id bigint, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        sim.cosine_topk_pq(empty, qs, k=3, m=4)
    with pytest.raises(ValueError, match="empty"):
        sim.cosine_topk_opq(empty, qs, k=3, m=4)


def test_opq_rotation_is_orthonormal_and_seeded(spark):
    import numpy as np

    r1 = np.array(sim.opq_rotation(16, seed=7))
    r2 = np.array(sim.opq_rotation(16, seed=7))
    r3 = np.array(sim.opq_rotation(16, seed=8))
    assert np.allclose(r1 @ r1.T, np.eye(16), atol=1e-10)  # orthonormal
    assert (r1 == r2).all()  # deterministic under the seed
    assert not (r1 == r3).all()  # and actually seed-dependent


def test_opq_rotation_preserves_exact_scores(spark):
    """<Rq, Rv> = <q, v>: brute-force top-k over rotated vectors must
    equal brute-force over the raw ones, rows and rounded scores."""
    emb = t(spark, SF_SMOKE, "embeddings")
    rot = sim.opq_rotation(64, seed=42)
    remb = sim.rotate_vectors(emb, rot, "embedding")
    qs = sim.make_queries(emb, QUERY_IDS)
    rqs = sim.rotate_vectors(qs, rot, "query_vec")
    raw = {(r["query_id"], r["vec_id"]): r["cos"]
           for r in sim.cosine_topk_bruteforce(emb, qs, k=K).collect()}
    rotated = {(r["query_id"], r["vec_id"]): r["cos"]
               for r in sim.cosine_topk_bruteforce(remb, rqs, k=K).collect()}
    assert set(raw) == set(rotated)
    assert all(abs(raw[p] - rotated[p]) <= 1e-3 for p in raw)


def test_rotate_vectors_gemm_path_row_identical_to_expression(spark):
    """The Arrow-GEMM rotation (d > gemm_threshold) must match the
    expression-literal rotation row-for-row: same ids, elementwise
    agreement to accumulation noise (<1 ulp·d), and bit-identical
    downstream top-k under the places=4 rounding contract."""
    emb = t(spark, SF_SMOKE, "embeddings")
    rot = sim.opq_rotation(64, seed=42)
    by_expr = {
        r["vec_id"]: r["embedding"]
        for r in sim.rotate_vectors(emb, rot, "embedding").collect()
    }
    by_gemm = {
        r["vec_id"]: r["embedding"]
        for r in sim.rotate_vectors(emb, rot, "embedding", gemm_threshold=0).collect()
    }
    assert set(by_expr) == set(by_gemm)
    assert all(
        abs(a - b) <= 1e-9
        for vid in by_expr
        for a, b in zip(by_expr[vid], by_gemm[vid])
    )
    # end-to-end: identical ranked rows once scores round at places=4
    qs = sim.make_queries(emb, QUERY_IDS)
    gq = sim.rotate_vectors(qs, rot, "query_vec", gemm_threshold=0)
    eq = sim.rotate_vectors(qs, rot, "query_vec")
    gemm_rows = sorted(
        map(tuple, sim.cosine_topk_bruteforce(
            sim.rotate_vectors(emb, rot, "embedding", gemm_threshold=0), gq, k=K
        ).collect())
    )
    expr_rows = sorted(
        map(tuple, sim.cosine_topk_bruteforce(
            sim.rotate_vectors(emb, rot, "embedding"), eq, k=K
        ).collect())
    )
    assert gemm_rows == expr_rows


def test_opq_trained_rotation_beats_random_on_adc_error(spark):
    """Ge et al.'s alternating optimization must spend the quantizer's
    error budget at least as well as the seeded random rotation: PQ
    quantization error of the trained rotation <= random's on the same
    sample/codebook budget. Also pins orthonormality + determinism."""
    import numpy as np

    emb = t(spark, SF_SMOKE, "embeddings")
    X = np.array(
        [list(r["embedding"]) for r in emb.sort("vec_id").collect()], dtype=np.float64
    )
    r_rand = np.array(sim.opq_rotation(64, seed=42))
    r_tr = np.array(sim.opq_rotation_trained(emb, m=8, n_codes=16, seed=42, iters=4))
    assert np.allclose(r_tr @ r_tr.T, np.eye(64), atol=1e-9)
    r_tr2 = np.array(sim.opq_rotation_trained(emb, m=8, n_codes=16, seed=42, iters=4))
    assert (r_tr == r_tr2).all()
    err_rand, _, _ = sim._pq_quant_error(X, r_rand, 8, 16, seed=42)
    err_tr, _, _ = sim._pq_quant_error(X, r_tr, 8, 16, seed=42)
    assert err_tr <= err_rand, (err_tr, err_rand)


def test_opq_trained_rerank_recall_on_real_corpus(spark):
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, QUERY_IDS)
    exact = _pairs(sim.cosine_topk_bruteforce(emb, qs, k=K))
    got = sim.cosine_topk_opq(
        emb, qs, k=K, m=8, n_codes=16, rerank=50, seed=42,
        train_fraction=0.25, rotation="trained",
    )
    recall = len(_pairs(got) & exact) / len(exact)
    assert recall >= 0.5, recall


def test_opq_rerank_recall_on_real_corpus(spark):
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, QUERY_IDS)
    exact = _pairs(sim.cosine_topk_bruteforce(emb, qs, k=K))
    got = sim.cosine_topk_opq(
        emb, qs, k=K, m=8, n_codes=16, rerank=50, seed=42, train_fraction=0.25
    )
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == set(QUERY_IDS)
    assert all(sorted(v) == list(range(1, K + 1)) for v in by_q.values())
    recall = len(_pairs(got) & exact) / len(exact)
    assert recall >= 0.5, recall
