"""Deduplication operators (driver-mandated extension).

Five dedup strategies, all shuffle-parallel DataFrame plans with zero
Python in the row path:

- exact:        hash-groupBy on content (or md5 fingerprint of it)
- minhash+LSH:  char-shingles → k minhashes → band buckets → bucket join
- simhash:      per-bit majority vote over shingle hashes → 60-bit code
- ngram-jaccard: exact pairwise Jaccard via a shingle equi-join
- embedding-cosine: see operators/similarity.py (near_dup_pairs)

Portability design: content hashing uses md5 (identical bytes in every
engine) rather than Spark's xxhash64/murmur, so every stage here is
reproducible cross-engine and oracle-checkable in DuckDB. Minhash takes
the lexicographic min over md5 hex digests — the min of a 128-bit
uniform hash — per (doc, seed).

Scale: shingle explosion multiplies rows by ~doc_len, but each stage is
a map + hash-aggregate on doc_id (combines map-side); the LSH bucket
join shuffles only (band, signature) keys. Nothing is quadratic except
within-bucket candidate generation, which LSH keeps tiny by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per identical content.
    One hash-aggregate; at 100 TB, group on md5(content) instead of the
    raw content to shrink shuffle payload (see ``exact_dedup_groups``)."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def exact_dedup_groups(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Exact dedup keyed on the md5 of the content: shuffles 16-byte
    keys, not document bodies. Returns fp, keep_id, n_copies."""
    return (
        df.select(F.md5(F.col(content_col).cast("binary")).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Explode a text column into character n-gram shingles.

    JVM-side: sequence(1, len-n+1) positions → transform → explode.
    Docs shorter than n produce no shingles (dropped — they cannot be
    near-dup candidates at this shingle size).
    """
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: c.substr(i, F.lit(n)),
    )
    out = df.filter(F.length(c) >= n).select(
        F.col(id_col), F.explode(grams).alias("shingle")
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    shingled: DataFrame, id_col: str, n_hashes: int = 16
) -> DataFrame:
    """k independent minhashes per doc: for seed s, the minimum of
    md5(shingle || '#' || s) over the doc's shingles.

    One explode (×k, k small) + one hash-aggregate on (doc, seed).
    Output: id, seed, minhash (32-hex string).
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (
        shingled.select(F.col(id_col), F.col("shingle"), seeds)
        .select(
            id_col,
            "seed",
            F.md5(
                F.concat_ws("#", F.col("shingle"), F.col("seed").cast("string")).cast(
                    "binary"
                )
            ).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the k minhashes into ``bands`` groups of k/bands rows; docs
    sharing any band signature become candidate pairs (id_a < id_b).

    The band signature is md5 of the concatenated row hashes, so the
    self-join key is (band, 32-hex) — small shuffle payload. Candidate
    generation is the classic LSH guarantee: pairs with Jaccard ≥ t
    collide in ≥1 band with probability 1-(1-t^r)^b.
    """
    rows_per_band = n_hashes // bands
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|", F.array_sort(F.collect_list(F.concat_ws(":", F.col("seed"), F.col("minhash"))))
                ).cast("binary")
            ).alias("band_sig")
        )
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full minhash-LSH near-dup pipeline: shingle → sign → band →
    candidates → verify candidates with EXACT Jaccard (one extra
    shingle join restricted to candidate pairs) → pairs ≥ threshold.

    Verification makes the output deterministic (no LSH
    false-positives), which is what a production dedup emits.
    """
    shingled = char_shingles(df, id_col, text_col, n=n).cache()
    sigs = minhash_signatures(shingled, id_col, n_hashes=n_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes=n_hashes, bands=bands)
    verified = _jaccard_on_pairs(shingled, cands, id_col)
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def _jaccard_on_pairs(shingled: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Exact Jaccard for given (id_a, id_b) pairs from a distinct
    shingle table. |A∩B| via shingle join; sizes via one aggregate;
    |A∪B| = |A|+|B|−|A∩B|. Division of exact ints → exact double."""
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    ga = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    gb = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("ix") / (F.col("sz_a") + F.col("sz_b") - F.col("ix"))).alias(
                "jaccard"
            ),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold.

    The candidate set is 'pairs sharing ≥1 shingle' (an equi-join on
    the shingle, not a cross join); exact but quadratic in the worst
    case — the baseline the LSH variant approximates. Use on bounded
    subsets; at 100 TB use minhash_dedup_pairs.
    """
    shingled = char_shingles(df, id_col, text_col, n=n)
    ga = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    gb = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        ga.join(gb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _jaccard_on_pairs(shingled, cand, id_col).filter(
        F.col("jaccard") >= threshold
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, bits: int = 32
) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over shingle hashes.

    Hash = first 15 hex chars of md5 (60 uniform bits, engine-portable);
    bit b of the fingerprint is 1 iff more shingles have bit b set than
    unset. Executes as shingle-explode × bits → two hash-aggregates.
    Near-dup docs differ in few bits (compare via hamming ≤ r or band
    the code like LSH).
    """
    shingled = char_shingles(df, id_col, text_col, n=n)
    h60 = F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # shiftleft/shiftright take a Column bit count only in SQL form
    votes = (
        shingled.select(id_col, h60.alias("h"), bit)
        .select(
            id_col,
            "bit",
            (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )
