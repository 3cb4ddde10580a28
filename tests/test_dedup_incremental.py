"""Incremental (batch-vs-corpus) dedup — the ingest shape.

Planted corpus + arriving batch: the batch holds an exact duplicate,
a near duplicate (one word changed), and a genuinely new document.
Pins:

1. the near-dup matcher returns cross-side pairs only (batch_id from
   the batch namespace, corpus_id from the corpus);
2. exact + near dups are filtered by incremental_new_docs, the new doc
   survives;
3. matcher output agrees with the quadratic exact baseline restricted
   to cross-side pairs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import dedup as dd  # noqa: E402

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "spark shuffles partition data between executor stages very quickly"),
    (2, "columnar parquet scans prune row groups with min max statistics"),
]
BATCH = [
    (100, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (101, "spark shuffles partition data between executor stages very slowly"),  # near dup of 1
    (102, "watermarks bound late event state in structured streaming joins"),  # new
]


def _dfs(spark):
    schema = "doc_id bigint, text string"
    return (
        spark.createDataFrame(CORPUS, schema),
        spark.createDataFrame(BATCH, schema),
    )


def test_cross_side_matches(spark):
    corpus, batch = _dfs(spark)
    out = {
        (r["batch_id"], r["corpus_id"]): r["jaccard"]
        for r in dd.incremental_minhash_pairs(
            corpus, batch, "doc_id", "text", n=4, threshold=0.5
        ).collect()
    }
    assert (100, 0) in out and out[(100, 0)] == 1.0
    assert (101, 1) in out and 0.5 <= out[(101, 1)] < 1.0
    # new doc matches nothing; no same-side pairs ever appear
    assert all(b >= 100 and c < 100 for (b, c) in out)
    assert 102 not in {b for (b, _) in out}


def test_ingest_filter_keeps_only_new(spark):
    corpus, batch = _dfs(spark)
    kept = {
        r["doc_id"]
        for r in dd.incremental_new_docs(
            corpus, batch, "doc_id", "text", n=4, threshold=0.5
        ).collect()
    }
    assert kept == {102}


def test_matches_quadratic_baseline_cross_side(spark):
    corpus, batch = _dfs(spark)
    # quadratic exact baseline over the union, restricted to cross-side
    union = corpus.unionByName(batch)
    base = {
        (r["id_b"], r["id_a"])  # batch ids are larger -> id_b is batch side
        for r in dd.ngram_jaccard_pairs(union, "doc_id", "text", n=4, threshold=0.5)
        .filter((F.col("id_b") >= 100) & (F.col("id_a") < 100))
        .collect()
    }
    inc = {
        (r["batch_id"], r["corpus_id"])
        for r in dd.incremental_minhash_pairs(
            corpus, batch, "doc_id", "text", n=4, threshold=0.5
        ).collect()
    }
    # LSH can only miss (never invent) pairs; on this tiny fixture the
    # band collision is certain for both true pairs
    assert inc == base
