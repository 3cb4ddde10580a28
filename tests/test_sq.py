"""SQ8 scalar-quantization ANN: per-dim affine 8-bit codes (FAISS SQ8
shape) — quantization error bounds, degenerate-dim exactness,
partitioning invariance, and recall vs the oracle-verified brute
force."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import similarity as sim  # noqa: E402
from spark_cassandra_collabfiltering_spark.plans.queries import t  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402

K = 5
QUERY_IDS = [0, 1, 2, 3, 4]


def _pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def test_sq_quantization_error_within_half_step(spark):
    emb = t(spark, SF_SMOKE, "embeddings").limit(100)
    codes, lo, hi, step = sim.sq_index(emb)  # exact min/max training
    rows = {r["vec_id"]: r["codes"] for r in codes.collect()}
    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for vid, cs in rows.items():
        for j, c in enumerate(cs):
            assert 0 <= c <= 255
            dq = lo[j] + c * step[j]
            # in-range values (training saw everything) land within
            # half a step of their dequantization
            tol = step[j] / 2 + 1e-9
            assert abs(orig[vid][j] - dq) <= tol, (vid, j)


def test_sq_degenerate_dim_is_exact(spark):
    rows = [(i, [float(i), 3.25, -1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    codes, lo, hi, step = sim.sq_index(df, d=3)
    assert step[1] == 0.0 and step[2] == 0.0
    for r in codes.collect():
        assert r["codes"][1] == 0 and r["codes"][2] == 0
        # anorm2 reconstructs the constant dims exactly
        dq0 = lo[0] + r["codes"][0] * step[0]
        want = dq0 * dq0 + 3.25 * 3.25 + 1.0
        assert math.isclose(r["anorm2"], want, rel_tol=1e-12)


def test_sq_codes_partitioning_invariant(spark):
    emb = t(spark, SF_SMOKE, "embeddings")
    one = {
        r["vec_id"]: (tuple(r["codes"]), round(r["anorm2"], 9))
        for r in sim.sq_index(emb, train_fraction=0.25)[0].collect()
    }
    two = {
        r["vec_id"]: (tuple(r["codes"]), round(r["anorm2"], 9))
        for r in sim.sq_index(emb.repartition(13), train_fraction=0.25)[0].collect()
    }
    assert one == two


def test_sq_recall_and_rerank_on_real_corpus(spark):
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, QUERY_IDS)
    exact = _pairs(sim.cosine_topk_bruteforce(emb, qs, k=K))
    # pure ADC pass: 8-bit per-dim codes keep cosine order well enough
    # that raw recall is already high on 64-dim data
    raw = sim.cosine_topk_sq(emb, qs, k=K, train_fraction=0.25)
    assert len(_pairs(raw) & exact) / len(exact) >= 0.7
    # exact re-rank over a small shortlist recovers brute-force results
    reranked = sim.cosine_topk_sq(emb, qs, k=K, rerank=50, train_fraction=0.25)
    rows = reranked.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == set(QUERY_IDS)
    assert all(sorted(v) == list(range(1, K + 1)) for v in by_q.values())
    assert len(_pairs(reranked) & exact) / len(exact) >= 0.8


def test_sq_empty_training_sample_raises(spark):
    import pytest

    df = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(Exception):
        sim.sq_index(df, d=3, train_fraction=0.5)
