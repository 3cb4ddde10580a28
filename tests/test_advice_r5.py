"""Round-5 ADVICE hardening (ADVICE.md r4 items):

- sq_index's sampled-training path must compute per-dim min/max with
  the distributed Summarizer pass over the sampled DataFrame — never
  by collecting the sample to the driver (min/max needs no driver-side
  data, unlike the PQ/IVF k-means fits).
- lsh_candidate_pairs oversize="reband" must keep every member of a
  hot bucket connected to the bucket minimum in the candidate graph
  (the star-mode connectivity guarantee): each refined sub-bucket
  emits a bridge edge sub-bucket-min -> original-bucket-min.
- domain_mix_sample must not let NULL keys inflate the per-bucket
  prefix counts and silently short a domain's quota.
- write_jsonl must fail fast (Spark "error" mode) on an existing
  target path unless overwrite is explicitly requested.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import curation as cu  # noqa: E402
from spark_cassandra_collabfiltering_spark.operators import dedup as dd  # noqa: E402
from spark_cassandra_collabfiltering_spark.operators import similarity as sim  # noqa: E402
from spark_cassandra_collabfiltering_spark.sources import jsonl_source as js  # noqa: E402


# ---------------------------------------------------------------------------
# SQ8 sampled training = Summarizer over the sample (no driver collect)
# ---------------------------------------------------------------------------

def test_sq_sampled_bounds_match_sample_extrema(spark):
    rows = [(i, [float(i % 7) - 3.0, float((i * 13) % 11)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    frac = 0.5
    _, lo, hi, step = sim.sq_index(df, train_fraction=frac, d=2)
    # independent reference: the deterministic keyed sample's extrema
    from spark_cassandra_collabfiltering_spark.operators.relational import hash_bucket

    sample = df.filter(hash_bucket(F.col("vec_id"), 1000) < int(round(frac * 1000)))
    vals = [list(r["embedding"]) for r in sample.collect()]
    assert vals, "sample unexpectedly empty"
    want_lo = [min(v[j] for v in vals) for j in range(2)]
    want_hi = [max(v[j] for v in vals) for j in range(2)]
    assert lo == pytest.approx(want_lo)
    assert hi == pytest.approx(want_hi)
    assert step == pytest.approx([(h - l) / 255.0 for l, h in zip(want_lo, want_hi)])


def test_sq_empty_training_sample_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(Exception):
        sim.sq_index(df, train_fraction=None, d=2)


# ---------------------------------------------------------------------------
# reband bridge edges: hot-bucket connectivity == star mode
# ---------------------------------------------------------------------------

def _sigs(spark):
    # n_hashes=2, bands=2 (r=1): band0 key = mh0, band1 key = mh1.
    # All six docs share mh0=1 -> band0 bucket of 6 (hot at cap=2).
    # Next-band refinement splits it into {1,2,3} (mh1=10) and
    # {4,5,6} (mh1=20) — both still hot -> star inside each, and the
    # bridge 1-4 is the ONLY link between the halves.
    rows = [(1, 1, 10), (2, 1, 10), (3, 1, 10), (4, 1, 20), (5, 1, 20), (6, 1, 20)]
    return spark.createDataFrame(rows, ["doc_id", "mh0", "mh1"])


def _components(pairs):
    # tiny driver-side union-find over the candidate edges
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    return {n: find(n) for n in parent}


def test_reband_bridge_preserves_hot_bucket_connectivity(spark):
    pairs = dd.lsh_candidate_pairs(
        _sigs(spark), "doc_id", n_hashes=2, bands=2,
        max_band_bucket=2, oversize="reband",
    )
    labels = _components(pairs)
    assert set(labels) == {1, 2, 3, 4, 5, 6}
    assert len(set(labels.values())) == 1  # one component, as star gives
    # and the bridge edge itself is present
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 4) in got


def test_reband_connectivity_matches_star_mode(spark):
    star = dd.lsh_candidate_pairs(
        _sigs(spark), "doc_id", n_hashes=2, bands=2,
        max_band_bucket=2, oversize="star",
    )
    reband = dd.lsh_candidate_pairs(
        _sigs(spark), "doc_id", n_hashes=2, bands=2,
        max_band_bucket=2, oversize="reband",
    )
    assert set(_components(star).values()) == {1}
    assert set(_components(reband).values()) == {1}


# ---------------------------------------------------------------------------
# domain_mix_sample NULL keys
# ---------------------------------------------------------------------------

def test_domain_mix_null_keys_do_not_short_quota(spark):
    rows = [(i, "web") for i in range(1, 11)] + [(None, "web")] * 3
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cu.domain_mix_sample(df, {"web": 5})
    got = out.collect()
    assert len(got) == 5  # full quota despite NULL-key rows present
    assert all(r["doc_id"] is not None for r in got)


# ---------------------------------------------------------------------------
# write_jsonl fail-fast default
# ---------------------------------------------------------------------------

def test_write_jsonl_default_refuses_existing_path(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    out = str(tmp_path / "shards")
    js.write_jsonl(df, out)
    with pytest.raises(Exception):
        js.write_jsonl(df, out)  # default must NOT wipe existing data
    js.write_jsonl(df, out, mode="overwrite")  # explicit opt-in works


# ---------------------------------------------------------------------------
# ja/ko unicode-block language ID (round-5 coverage extension)
# ---------------------------------------------------------------------------

def test_lang_id_ja_ko_blocks(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "これはテストです。ひらがなのぶんしょう。"),   # hiragana
            (2, "カタカナノテキストサンプル"),                  # katakana
            (3, "한국어 문서입니다 감사합니다"),                # hangul
            (4, "这是中文测试文档"),                            # kanji only -> zh
            (5, "the quick brown fox and the lazy dog"),        # en
            (6, "12345 !!!"),                                   # nothing -> und
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(docs).collect()}
    assert got == {1: "ja", 2: "ja", 3: "ko", 4: "zh", 5: "en", 6: "und"}


# ---------------------------------------------------------------------------
# document chunking boundary math + dedup canonicalization (round 5)
# ---------------------------------------------------------------------------

def test_chunk_documents_boundaries(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "a" * 10),   # short: one chunk, len 10
            (2, "b" * 200),  # exactly size: one chunk
            (3, "c" * 201),  # one char over: two chunks (second len 51)
            (4, "d" * 500),  # 1 + ceil(300/150) = 3 chunks
            (5, ""),         # empty: no chunks
        ],
        ["doc_id", "text"],
    )
    out = tx.chunk_documents(docs, size=200, stride=150)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_len"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (1, 10),
        (2, 0): (1, 200),
        (3, 0): (1, 200), (3, 1): (151, 51),
        (4, 0): (1, 200), (4, 1): (151, 200), (4, 2): (301, 200),
    }
    # overlap contract: consecutive chunks overlap by size - stride
    import hashlib

    md5s = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_md5"] for r in out.collect()
    }
    assert md5s[(4, 1)] == hashlib.md5(b"d" * 200).hexdigest()

    with pytest.raises(ValueError):
        tx.chunk_documents(docs, size=100, stride=101)


def test_keep_best_per_cluster_tiebreaks(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["node", "cluster_id"]
    )
    scores = spark.createDataFrame(
        # cluster 1: node 2 wins on score; cluster 10: tie -> min id (10)
        [(1, 50), (2, 90), (3, 90 - 1), (10, 70), (11, 70)],
        ["doc_id", "quality_e6"],
    )
    got = {
        r["cluster_id"]: (r["keep_id"], r["keep_score"], r["n_members"])
        for r in dd.keep_best_scored(clusters, scores).collect()
    }
    assert got == {1: (2, 90, 3), 10: (10, 70, 2)}
