"""Differential oracle tests (SURVEY §5.3-3): every registry query with
an oracle must exact-match DuckDB at sf0.001 (fast); the driver repeats
this at sf0.01. Rows-only queries must at least run and return rows."""

from __future__ import annotations

import pytest

from spark_cassandra_collabfiltering_spark.plans.oracle import duckdb_conn, run_compare
from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


# The heavy COMPOSED queries re-run whole sub-pipelines (clusters/CC,
# canonicalize, corpus assembly) and cost 25-82 s EACH at sf0.001 —
# ~6 min of the suite for differential coverage the driver repeats
# itself at sf0.01 on every declared query. They run in the slow lane;
# every operator they compose keeps its own fast parity row here.
_SLOW_PARITY = {
    "curation_cluster_split",
    "curation_url_canonical",
    "dedup_keep_best",
    "dedup_recall_matrix",
    "lake_column_mapping",
    "lake_txn_changes",
    "ml_nb_auc",
    "ml_nb_f1",
    "dedup_canonicalize",
    "dedup_clusters",
    "dedup_clusters_bigstar",
    "dedup_clusters_incremental",
    "pipeline_corpus_assembly",
    "curation_pipeline_verdict",
    "curation_health_by_source",
    "curation_temperature_mix",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in sorted(QUERIES)
    ],
)
def test_query_matches_oracle(spark, conn, name):
    res = run_compare(spark, SF_SMOKE, name, conn)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25


def test_driver_window_posture():
    """The 50-slot driver window must stay fully registered, and its
    rows-only membership must be EXACTLY the declared allowlist —
    rows-only-BY-NATURE queries only (seeded-iteration ML, k-means
    codebook families, implementation-defined BPE order, zlib level
    detail). The r9 rotation deliberately windows the rows-only
    never-windowed names (after r9 every registered query has held a
    driver slot at least once); a rotation that sneaks an
    UNDECLARED oracle-less query into the window still degrades the
    correctness gate and fails here instead of in the next round's
    verdict."""
    from spark_cassandra_collabfiltering_spark.plans import queries as q

    names = q._ordered_names()[:50]
    assert len(names) == 50
    assert all(n in q.QUERIES for n in names)
    rows_only = [n for n in names if q.QUERIES[n].oracle is None]
    assert rows_only == [
        # anchors + the r9 never-windowed rows-only family (each is
        # rows-only by NATURE, not by omission)
        "cf_als_pipeline",      # seeded iterative ALS
        "ann_sq_topk",          # k-means/scalar-quantizer codebooks
        "ann_pq_topk",
        "ann_ivfpq_topk",
        "ann_opq_topk",
        "ann_pca_topk",
        "dedup_semantic",       # SemDeDup over k-means clusters
        "text_bpe_merges",      # merge order implementation-defined
        "text_bpe_encode",
        "text_compression_ratio",  # zlib level detail
        "cf_ndcg_als",          # ALS-scored ranking eval
    ], rows_only
