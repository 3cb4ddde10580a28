"""From-scratch protobuf ingest (r8, the second half of VERDICT r7
missing #4): wire-format decode (varint/zigzag/fixed/length-delimited),
packed AND unpacked repeated fields, nested messages, unknown-field
skipping by wire type (the schema-evolution contract), delimited-stream
framing with honest tail quarantine, and the file-parallel Spark
surface. A hand-computed byte blob pins the spec encoding independent
of the writer."""

import struct

import pytest
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.sources import proto_source as pr

SCHEMA = {
    1: ("id", "int64"),
    2: ("name", "string"),
    3: ("score", "double"),
    4: ("flags", "repeated sint32"),
    5: ("meta", {1: ("k", "string"), 2: ("n", "int32")}),
}


def _rows(n, lo=0):
    return [
        {
            "id": i,
            "name": f"r-{i}",
            "score": i * 0.25,
            "flags": [i, -i, 7] if i % 2 else None,
            "meta": {"k": f"m{i}", "n": -i} if i % 3 else None,
        }
        for i in range(lo, lo + n)
    ]


def test_round_trip_delimited_stream(spark, tmp_path):
    p = str(tmp_path / "d.pb")
    pr.write_proto(_rows(120), SCHEMA, p)
    clean, bad = pr.split_corrupt(pr.read_proto(spark, p, SCHEMA))
    assert bad.isEmpty()
    got = {r["id"]: r for r in clean.collect()}
    assert len(got) == 120
    assert got[0]["flags"] is None and got[0]["meta"] is None
    assert list(got[1]["flags"]) == [1, -1, 7]
    assert got[4]["meta"]["k"] == "m4" and got[4]["meta"]["n"] == -4
    assert got[3]["score"] == 0.75


def test_hand_computed_bytes_pin_the_spec():
    """{id: 150, name: "ab", score: 1.5, flags packed [1,-2]} encoded
    BY HAND per the encoding spec."""
    body = (
        b"\x08" + b"\x96\x01"            # field 1 varint 150
        + b"\x12\x02" + b"ab"            # field 2 len 2
        + b"\x19" + struct.pack("<d", 1.5)  # field 3 64-bit
        + b"\x22\x02" + b"\x02\x03"      # field 4 packed: zz(1)=2 zz(-2)=3
    )
    blob = pr._enc_varint(len(body)) + body
    rows = list(pr.parse_delimited_bytes(blob, SCHEMA, file="hand"))
    assert len(rows) == 1
    r = rows[0]
    assert r["corrupt_reason"] is None
    assert r["id"] == 150 and r["name"] == "ab" and r["score"] == 1.5
    assert r["flags"] == [1, -2] and r["meta"] is None


def test_unpacked_repeated_and_unknown_fields_skip():
    # unpacked repeated sint32 (tag per element) + a foreign field 99
    # of every wire type interleaved — the decoder must skip them all
    tag4 = pr._enc_varint((4 << 3) | 0)
    body = (
        tag4 + b"\x02"                        # flags: zz(1)
        + pr._enc_varint((99 << 3) | 0) + b"\xff\x01"        # unknown varint
        + tag4 + b"\x03"                      # flags: zz(-2)
        + pr._enc_varint((99 << 3) | 2) + b"\x03" + b"xyz"   # unknown len
        + pr._enc_varint((99 << 3) | 1) + b"\x00" * 8        # unknown 64-bit
        + pr._enc_varint((99 << 3) | 5) + b"\x00" * 4        # unknown 32-bit
        + b"\x08" + b"\x05"                   # id = 5
    )
    msg = pr.decode_message(SCHEMA, body)
    assert msg == {"flags": [1, -2], "id": 5}


def test_corrupt_tail_quarantines_with_byte_count(spark, tmp_path):
    p = str(tmp_path / "d.pb")
    pr.write_proto(_rows(50), SCHEMA, p)
    blob = open(p, "rb").read()
    # append a message whose declared length runs past the end
    open(p, "wb").write(blob + pr._enc_varint(10**6) + b"\x08\x01")
    clean, bad = pr.split_corrupt(pr.read_proto(spark, p, SCHEMA))
    assert clean.count() == 50
    q = bad.collect()
    assert len(q) == 1 and "quarantined" in q[0]["corrupt_reason"]


def test_scalar_width_matrix_round_trips(spark, tmp_path):
    schema = {
        1: ("a", "sfixed32"), 2: ("b", "fixed32"), 3: ("c", "sfixed64"),
        4: ("d", "float"), 5: ("e", "bool"), 6: ("f", "bytes"),
        7: ("g", "uint32"), 8: ("h", "int32"),
    }
    rows = [{"a": -5, "b": 4000000000, "c": -(2**40), "d": 0.5,
             "e": True, "f": b"\x00\x01", "g": 2**31 + 3, "h": -7}]
    p = str(tmp_path / "w.pb")
    pr.write_proto(rows, schema, p)
    r = pr.read_proto(spark, p, schema).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (
        -5, 4000000000, -(2**40), 0.5, True
    )
    assert bytes(r["f"]) == b"\x00\x01"
    assert r["g"] == 2**31 + 3 and r["h"] == -7


def test_uint64_overflow_refuses():
    schema = {1: ("u", "uint64")}
    body = pr._enc_varint(1 << 3) + pr._enc_varint(2**63)
    with pytest.raises(ValueError, match="overflows"):
        pr.decode_message(schema, body)


def test_multi_file_scan_no_shuffle(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        pr.write_proto(_rows(25, lo=i * 25), SCHEMA, str(d / f"p{i}.pb"))
    clean, bad = pr.split_corrupt(pr.read_proto(spark, str(d), SCHEMA))
    assert bad.isEmpty() and clean.count() == 100
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
