"""Multimodal plumbing tests: the binary column + mapInPandas harness
(schemas, batch shapes, 1→1 and 1→N fan-out) with the stub codec."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import multimodal as mm
from spark_cassandra_collabfiltering_spark.plans.queries import t as load_table

from conftest import SF_SMOKE


def _media(spark):
    return mm.attach_binary_payload(load_table(spark, SF_SMOKE, "documents"))


def test_feature_extraction_matches_jvm_side(spark):
    media = _media(spark)
    feats = mm.extract_media_features(media)
    got = {r["doc_id"]: (r["n_bytes"], r["head_hex"]) for r in feats.collect()}
    want = {
        r["doc_id"]: (r["n"], r["hh"])
        for r in media.select(
            "doc_id",
            F.octet_length("payload").alias("n"),
            F.lower(F.hex(F.substring("payload", 1, 8))).alias("hh"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_resize_fixed_payload(spark):
    out = mm.resize_media(_media(spark), width=16, height=16)
    rows = out.collect()
    assert len(rows) > 0
    assert all(len(r["payload"]) == 256 for r in rows)
    assert all((r["width"], r["height"]) == (16, 16) for r in rows)


def test_frame_sampling_fanout(spark):
    media = _media(spark)
    frames = mm.sample_frames(media, frame_bytes=100, every_n=2)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = {
        r["doc_id"]: r["n_bytes"]
        for r in media.select(
            "doc_id", F.col("media_meta.n_bytes").alias("n_bytes")
        ).collect()
    }
    for doc_id, n_frames in per_doc.items():
        n_chunks = (sizes[doc_id] + 99) // 100
        assert n_frames == (n_chunks + 1) // 2  # every 2nd chunk
    # frame indices are the sampled ones
    idxs = [r["frame_idx"] for r in frames.filter(F.col("doc_id") == min(per_doc)).collect()]
    assert idxs == sorted(idxs) and all(i % 2 == 0 for i in idxs)
