"""Regression pins for the round-6 ADVICE findings fixed in round 7.

1. duplicate_spans' second gram chain must derive from the token
   STRING (salted), never from the first chain's 64-bit hash — a
   rehash of a hash collapses both chains on any single xxhash64
   token collision, cutting token-identity resistance to 64 bits.
2. The ja/zh prior must gate on kana SHARE, not bare kana presence:
   one stray kana (a quoted Japanese word, OCR noise) must not flip a
   long Chinese document to ja.
"""

import inspect

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# duplicate_spans dual gram chains: independent at token level
# ---------------------------------------------------------------------------

def test_span_dedup_second_chain_hashes_token_string():
    # the specific flaw: _hb = xxhash64(salt, _ha) — a rehash of the
    # first chain. Pin that the source maps the salted hash over the
    # token array, not over _ha.
    from spark_cassandra_collabfiltering_spark.operators import dedup as dd

    src = inspect.getsource(dd.duplicate_spans)
    assert 'F.transform(F.col("_ha")' not in src
    assert '"_ws"' in src  # both chains read the token-string array


def test_span_dedup_chain_values_match_direct_token_hash(spark):
    # behavioral form of the same pin: replicate the staged projection
    # and check _hb equals xxhash64(salt, token) — NOT
    # xxhash64(salt, xxhash64(token)).
    row = spark.sql(
        """SELECT xxhash64(2654435769, 'alpha')            AS want,
                  xxhash64(2654435769, xxhash64('alpha'))  AS rehash"""
    ).collect()[0]
    assert row["want"] != row["rehash"]  # the two derivations differ

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    from spark_cassandra_collabfiltering_spark.operators import dedup as dd

    # n=2, both docs identical -> every gram duplicated -> one maximal
    # span covering all 4 word positions in each doc
    spans = dd.duplicate_spans(docs, n=2, min_docs=2).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans}
    assert got == {(1, 0, 3), (2, 0, 3)}


# ---------------------------------------------------------------------------
# ja/zh prior: share-gated, not presence-gated
# ---------------------------------------------------------------------------

def test_lang_id_stray_kana_does_not_flip_long_zh_doc(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            # ~50 han with ONE kana (a quoted Japanese word): must stay zh
            (1, "中国国家统计局发布年度经济报告显示工业生产总值持续增长"
                "科学技术创新能力不断提高引用日文词の一例城市基础设施建设全面推进"),
            # kanji-heavy ja with particle-level kana: share is well
            # above 1/K -> still ja (the r6 fix must survive the gate)
            (2, "東京都市計画道路建設工事の完了報告書です"),
            (3, "新幹線高速鉄道網整備計画が国会審議を通過した"),
            # kana-free zh control
            (4, "这是中文测试文档没有假名只有汉字"),
            # kana-dominant ja
            (5, "これはにほんごのテストです。"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(docs).collect()}
    assert got == {1: "zh", 2: "ja", 3: "ja", 4: "zh", 5: "ja"}


def test_lang_id_share_gate_boundary(spark):
    # exactly at the threshold: kana*K == han -> NOT ja (strict >);
    # one more kana tips it
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    K = tx.JA_KANA_PRIOR_K
    han = "漢" * K
    docs = spark.createDataFrame(
        [(1, han + "の"), (2, han + "のは")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(docs).collect()}
    assert got == {1: "zh", 2: "ja"}
