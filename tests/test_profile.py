"""Column profiler (aggregates.profile_columns): null/ndv/min-max
rendering pins, including the decimal rendering rule for doubles."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg  # noqa: E402


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, "a", None),
            (3, None, 2.5),
            (4, "b", 1e20),
        ],
        "id bigint, s string, x double",
    )
    got = {r.column: r for r in agg.profile_columns(df).collect()}
    assert set(got) == {"id", "s", "x"}
    assert all(r.n_rows == 4 for r in got.values())
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert got["x"].n_null == 1 and got["x"].n_distinct == 3
    assert got["id"].n_null == 0 and got["id"].n_distinct == 4
    assert (got["id"].min_val, got["id"].max_val) == ("1", "4")
    assert (got["s"].min_val, got["s"].max_val) == ("a", "b")
    # doubles render via DECIMAL(30,6) — no engine-specific E-notation
    assert got["x"].min_val == "1.500000"
    assert got["x"].max_val == "100000000000000000000.000000"


def test_profile_columns_subset_and_all_null(spark):
    df = spark.createDataFrame(
        [(None,), (None,)], "y double"
    )
    got = agg.profile_columns(df, ["y"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_null == 2 and r.n_distinct == 0
    assert r.min_val is None and r.max_val is None


# --- encoding-damage screen -------------------------------------------------


def test_encoding_quality_flags_each_damage_class(spark):
    from spark_cassandra_collabfiltering_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "perfectly clean ascii text"),
            (2, "decoder gave up � here"),
            (3, "binary\x01noise\x1f"),
            (4, "tabs\tand\nnewlines are fine"),
            (5, "cafÃ© naÃ¯ve " * 3),     # dense mojibake
            (6, "voilÃ " + " clean filler" * 200),  # sparse: < 1000 ppm
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in tx.encoding_quality(df).collect()}
    assert not got[1].enc_bad
    assert got[2].n_replacement == 1 and got[2].enc_bad
    assert got[3].n_control == 2 and got[3].enc_bad
    assert not got[4].enc_bad  # \t \n \r excluded from the control class
    assert got[5].n_mojibake == 6 and got[5].enc_bad
    assert got[6].n_mojibake == 1 and not got[6].enc_bad  # density gate


def test_encoding_quality_oracle_regex_parity(spark):
    """The literal-char patterns must count identically in Java regex
    (operator) and RE2 (DuckDB oracle) over planted damage."""
    import duckdb

    from spark_cassandra_collabfiltering_spark.operators import text as tx

    rows = [
        (1, "a�b�"),
        (2, "x\x00y\x07z\x0b"),
        (3, "Ã©â€™ mix Ã¼"),
        (4, "clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_replacement, r.n_control, r.n_mojibake)
        for r in tx.encoding_quality(df).collect()
    }
    con = duckdb.connect()
    for doc_id, text in rows:
        want = con.execute(
            r"""SELECT length(regexp_extract_all(?, '�', 0)),
                       length(regexp_extract_all(?, '[\x00-\x08\x0b\x0c\x0e-\x1f]', 0)),
                       length(regexp_extract_all(?, '(Ã.|â€.)', 0))""",
            [text, text, text],
        ).fetchone()
        assert got[doc_id] == tuple(want), (doc_id, got[doc_id], want)


def test_profile_empty_table_emits_zero_rows_per_column(spark):
    df = spark.createDataFrame([], "a bigint, b string")
    got = {r.column: r for r in agg.profile_columns(df).collect()}
    assert set(got) == {"a", "b"}
    for r in got.values():
        assert (r.n_rows, r.n_null, r.n_distinct) == (0, 0, 0)
        assert r.min_val is None and r.max_val is None


def test_skew_profile_empty_input_is_empty(spark):
    df = spark.createDataFrame([], "key bigint")
    assert agg.skew_profile(df, "key").collect() == []


def test_broadcast_advice_discriminates_at_scale(spark):
    """At sf0.1 the fact table's CBO-model estimate exceeds the 10 MiB
    broadcast threshold while the dims stay broadcastable — the
    advisor must say so (at tiny SFs everything fits; the point of
    the estimate is that the verdict flips with scale)."""
    from spark_cassandra_collabfiltering_spark.operators import aggregates as agg
    from spark_cassandra_collabfiltering_spark.plans.queries import t

    sf = "/root/testdata/sf0.1"
    out = {
        r.table: (r.est_bytes, r.broadcastable)
        for r in agg.broadcast_advice(
            [(n, t(spark, sf, n)) for n in ("region", "nation", "lineitem")]
        ).collect()
    }
    assert out["region"][1] and out["nation"][1]
    assert not out["lineitem"][1]
    assert out["lineitem"][0] > 10 * 1024 * 1024
