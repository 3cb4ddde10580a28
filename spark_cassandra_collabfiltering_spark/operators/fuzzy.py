"""Fuzzy string matching (record linkage / typo-tolerant joins).

A naive fuzzy join is the all-pairs levenshtein cross product — the
plan that dies first at scale. This module implements the SymSpell
shape (Garbe's symmetric-delete algorithm, public): every string's
1-deletion neighborhood is generated ROW-LOCALLY, md5-reduced, and the
join runs on the fixed-width variant key; the exact edit-distance
check then runs only on candidate pairs. Two strings within edit
distance 1 (insert/delete/substitute/equal) ALWAYS share a variant:

- equal:        share the string itself
- deletion:     dirty == clean minus one char -> dirty is in
                deletes1(clean) and is its own variant
- insertion:    symmetric
- substitution: deleting the substituted position from both sides
                yields the same string

so candidate generation is complete for max_dist=1 and the verify
filter removes the false candidates (strings sharing a delete but
distance 2 — e.g. a transposition). Scale: variants multiply rows by
~string length (bounded), shuffle keys are 16 bytes, and levenshtein
(quadratic per pair) touches only candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_variants(name: Column) -> Column:
    """All 1-deletion variants of the string plus the string itself,
    as array<string>. Row-local (one narrow fan-out when exploded)."""
    deletes = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda i: F.concat(
            F.substring(name, F.lit(1), i - 1),
            F.substring(name, i + 1, F.length(name)),
        ),
    )
    return F.array_distinct(F.concat(deletes, F.array(name)))


def _keyed(df: DataFrame, id_col: str, name_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(name_col).alias(f"{prefix}_name"),
        F.explode(delete_variants(F.col(name_col))).alias("_v"),
    ).select(
        f"{prefix}_id",
        f"{prefix}_name",
        F.md5(F.col("_v").cast("binary")).alias("_vk"),
    )


def fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str,
    dirty_name: str,
    clean_id: str,
    clean_name: str,
    max_dist: int = 1,
) -> DataFrame:
    """Match each dirty string to every clean string within edit
    distance ``max_dist`` (must be 1 — the 1-deletion neighborhood is
    complete exactly for distance <= 1; deeper neighborhoods are the
    standard extension but cube the fan-out).

    Output: (dirty_id, dirty_name, match_id, match_name, dist) — one
    row per verified (dirty, clean) pair, dist the exact levenshtein.
    """
    if max_dist != 1:
        raise ValueError("deletion-neighborhood blocking covers max_dist=1 only")
    dv = _keyed(dirty, dirty_id, dirty_name, "d")
    cv = _keyed(clean, clean_id, clean_name, "c")
    cand = dv.join(cv, "_vk").select(
        "d_id", "d_name", "c_id", "c_name"
    ).distinct()
    dist = F.levenshtein(F.col("d_name"), F.col("c_name"))
    return cand.filter(dist <= max_dist).select(
        F.col("d_id").alias("dirty_id"),
        F.col("d_name").alias("dirty_name"),
        F.col("c_id").alias("match_id"),
        F.col("c_name").alias("match_name"),
        dist.cast("bigint").alias("dist"),
    )
