"""PCA tests (trained dimensionality reduction, FAISS PCAMatrix shape).

PCA queries are rows-only for the oracle (eigendecomposition inside),
so correctness is pinned here: algebraic invariants of the trained
basis, row-identical projection vs NumPy, axis recovery on planted
anisotropic data, and shortlist recall on the real embeddings corpus.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import similarity as sim  # noqa: E402
from spark_cassandra_collabfiltering_spark.plans.queries import t  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


def _emb(spark):
    return t(spark, SF_SMOKE, "embeddings")


def test_components_orthonormal_and_explained_monotone(spark):
    mean, W, expl = sim.pca_train(_emb(spark), k=8)
    Wm = np.array(W)
    assert Wm.shape == (8, 64)
    assert np.allclose(Wm @ Wm.T, np.eye(8), atol=1e-9)
    assert all(a >= b for a, b in zip(expl, expl[1:]))
    assert all(0 <= e <= 1_000_000 for e in expl)
    # sign convention: largest-|coeff| entry of each component positive
    for row in Wm:
        assert row[np.abs(row).argmax()] > 0


def test_projection_matches_numpy_row_identical(spark):
    emb = _emb(spark)
    mean, W, _ = sim.pca_train(emb, k=6)
    got = {
        r.vec_id: list(r.pc)
        for r in sim.pca_project(emb, mean, W, out_col="pc").select("vec_id", "pc").collect()
    }
    rows = {r.vec_id: np.array(list(r.embedding), dtype=np.float64) for r in emb.collect()}
    Wm, mu = np.array(W), np.array(mean)
    for vid, v in rows.items():
        expect = Wm @ (v - mu)
        assert np.allclose(got[vid], expect, atol=1e-9), vid


def test_full_rank_projection_is_lossless(spark):
    emb = _emb(spark).limit(50)
    mean, W, _ = sim.pca_train(emb, k=64)
    proj = {
        r.vec_id: np.array(list(r.pc))
        for r in sim.pca_project(emb, mean, W, out_col="pc").select("vec_id", "pc").collect()
    }
    orig = {r.vec_id: np.array(list(r.embedding), dtype=np.float64) for r in emb.collect()}
    Wm, mu = np.array(W), np.array(mean)
    for vid in orig:
        recon = Wm.T @ proj[vid] + mu
        assert np.allclose(recon, orig[vid], atol=1e-8)


def test_planted_dominant_axis_recovered(spark):
    rng = np.random.RandomState(7)
    axis = np.zeros(16)
    axis[3] = 1.0
    X = rng.randn(300, 16) * 0.05 + rng.randn(300, 1) * 5.0 * axis
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )
    _, W, expl = sim.pca_train(df, k=2)
    lead = np.array(W[0])
    assert abs(lead[3]) > 0.99          # dominant direction found
    assert lead[3] > 0                   # sign convention applied
    assert expl[0] > 900_000             # >90% variance on component 0


def test_pca_shortlist_recall_on_real_embeddings(spark):
    # the testdata embeddings are near-uniform random — PCA's
    # adversarial case (flat spectrum, no low-dim structure), the same
    # caveat test_pq documents. Half the dims + 10x-overfetch rerank
    # still recovers >=0.9; measured sweep: (16,25)->0.52,
    # (24,50)->0.88, (32,50)->0.96, (32,100)->1.0.
    emb = _emb(spark)
    qs = sim.make_queries(emb, [0, 1, 2, 3, 4])
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk_bruteforce(emb, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk_pca(emb, qs, k=5, n_components=32, rerank=50).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_pca_shortlist_exact_on_low_rank_data(spark):
    # data that actually lives in a low-dim subspace (the regime
    # trained embeddings approximate): 4 latent dims embedded in 32,
    # plus tiny noise — an 8-component shortlist is effectively exact
    rng = np.random.RandomState(11)
    Z = rng.randn(200, 4)
    M = rng.randn(4, 32)
    X = Z @ M + rng.randn(200, 32) * 1e-3
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )
    qs = sim.make_queries(df, [0, 1, 2])
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk_bruteforce(df, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk_pca(df, qs, k=5, n_components=8, rerank=10).collect()
    }
    assert approx == exact


def test_train_fraction_bounds_sample_and_stays_deterministic(spark):
    emb = _emb(spark)
    a = sim.pca_train(emb, k=4, train_fraction=0.5)
    b = sim.pca_train(emb, k=4, train_fraction=0.5)
    assert a == b
    full = sim.pca_train(emb, k=4)
    # sampled basis differs from full-corpus basis but spans similar space
    assert not np.allclose(np.array(a[1]), np.array(full[1]))


# --- rrf_fuse --------------------------------------------------------------


def test_rrf_two_arm_agreement_dominates(spark):
    # item 10 is rank 1 in both arms; item 20 rank 2 in one arm only;
    # item 30 rank 2/3 split. Two-arm presence must outrank any
    # single-arm rank.
    arm1 = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 2), (1, 20, 3)], "query_id bigint, vec_id bigint, rank int"
    )
    arm2 = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 3), (1, 40, 2)], "query_id bigint, vec_id bigint, rank int"
    )
    got = {r.vec_id: r for r in sim.rrf_fuse([arm1, arm2], topk=4).collect()}
    assert got[10].fused_rank == 1 and got[10].n_arms == 2
    # 10: 2*(1e6//61) = 32786; 30: 1e6//62 + 1e6//63 = 16129+15873 = 32002
    assert got[10].rrf_e6 == 2 * (1_000_000 // 61)
    assert got[30].rrf_e6 == 1_000_000 // 62 + 1_000_000 // 63
    assert got[30].fused_rank == 2
    # single-arm items follow, id tiebreak between equal scores
    assert got[40].n_arms == 1 and got[20].n_arms == 1


def test_rrf_id_tiebreak_deterministic(spark):
    arm = spark.createDataFrame(
        [(1, 5, 1), (1, 3, 1)], "query_id bigint, vec_id bigint, rank int"
    )
    got = [r.vec_id for r in sim.rrf_fuse([arm], topk=2).orderBy("fused_rank").collect()]
    assert got == [3, 5]  # equal scores -> lower id first


# --- lexical retrieval + hybrid fusion -------------------------------------


def test_lexical_topk_ranks_shared_rare_terms_first(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (0, "zebra quark common"),
            (1, "zebra quark common"),  # shares both rare terms with 0
            (2, "zebra common"),        # shares one rare term
            (3, "common"),              # only the stop-ish term
        ],
        "doc_id bigint, text string",
    )
    qs = docs.filter(F.col("doc_id") == 0)
    got = {r.doc_id: r.rank for r in tx.lexical_topk(docs, qs, k=3).collect()}
    assert got[1] == 1 and got[2] == 2 and got[3] == 3


def test_lexical_stop_list_cap_drops_common_terms(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (0, "zebra common"),
            (1, "zebra common"),
            (2, "common"),
            (3, "common"),
        ],
        "doc_id bigint, text string",
    )
    qs = docs.filter(F.col("doc_id") == 0)
    # 'common' is in 4/4 docs; cap at 0.5 keeps only 'zebra' postings,
    # so doc 2/3 (stop-term-only overlap) drop out entirely
    got = {r.doc_id for r in tx.lexical_topk(docs, qs, k=4, max_df_fraction=0.5).collect()}
    assert got == {1}


def test_hybrid_three_arm_rrf_fusion(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx
    from spark_cassandra_collabfiltering_spark.plans.queries import t as t_

    emb = t_(spark, SF_SMOKE, "embeddings")
    docs = t_(spark, SF_SMOKE, "documents")
    qids = [0, 1, 2]
    qs = sim.make_queries(emb, qids)
    dense = sim.cosine_topk_bruteforce(emb, qs, k=5)
    lsh = sim.cosine_topk_lsh(emb, qs, k=5, bits=8)
    lex = (
        tx.lexical_topk(docs, docs.filter(F.col("doc_id").isin(qids)), k=5)
        .withColumnRenamed("doc_id", "vec_id")
    )
    fused = sim.rrf_fuse([dense, lsh, lex], topk=5)
    rows = fused.collect()
    assert {r.query_id for r in rows} == set(qids)
    for q in qids:
        ranked = sorted((r for r in rows if r.query_id == q), key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in ranked] == [1, 2, 3, 4, 5]
        assert all(1 <= r.n_arms <= 3 for r in ranked)
    # determinism: same plan twice, identical output
    again = {(r.query_id, r.vec_id, r.fused_rank) for r in sim.rrf_fuse([dense, lsh, lex], topk=5).collect()}
    assert again == {(r.query_id, r.vec_id, r.fused_rank) for r in rows}
