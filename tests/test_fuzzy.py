"""Pins for fuzzy.fuzzy_match (SymSpell deletion-neighborhood record
linkage): completeness for every distance-1 edit kind, exclusion of
distance-2 pairs (including the transposition false-candidate), and
duplicate-free output.
"""

from __future__ import annotations

import pytest

from spark_cassandra_collabfiltering_spark.operators import fuzzy as fz


def _match(spark, dirty_rows, clean_rows):
    dirty = spark.createDataFrame(dirty_rows, "d_key bigint, d_nm string")
    clean = spark.createDataFrame(clean_rows, "c_key bigint, c_nm string")
    out = fz.fuzzy_match(dirty, clean, "d_key", "d_nm", "c_key", "c_nm")
    rows = out.collect()
    pairs = [(r.dirty_id, r.match_id, r.dist) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate matched pairs"
    return set(pairs)


def test_all_edit_kinds_within_distance_one(spark):
    clean = [(1, "spark")]
    dirty = [
        (10, "spark"),   # equal        -> dist 0
        (11, "sprk"),    # deletion     -> dist 1
        (12, "sparky"),  # insertion    -> dist 1
        (13, "stark"),   # substitution -> dist 1
    ]
    got = _match(spark, dirty, clean)
    assert got == {(10, 1, 0), (11, 1, 1), (12, 1, 1), (13, 1, 1)}


def test_distance_two_excluded(spark):
    clean = [(1, "spark")]
    dirty = [
        (20, "sprak"),   # transposition: shares delete "sprk"/"spak"? -> dist 2
        (21, "stork"),   # two substitutions
        (22, "spa"),     # two deletions
        (23, "entirely"),
    ]
    assert _match(spark, dirty, clean) == set()


def test_multiple_candidates_all_reported(spark):
    clean = [(1, "cat"), (2, "cart"), (3, "cut")]
    dirty = [(30, "cat")]
    got = _match(spark, dirty, clean)
    assert got == {(30, 1, 0), (30, 2, 1), (30, 3, 1)}


def test_max_dist_guard(spark):
    dirty = spark.createDataFrame([(1, "a")], "d_key bigint, d_nm string")
    with pytest.raises(ValueError):
        fz.fuzzy_match(dirty, dirty, "d_key", "d_nm", "d_key", "d_nm", max_dist=2)
