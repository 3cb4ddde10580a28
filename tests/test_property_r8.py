"""Property tests for the r8 byte-level codecs — the code most worth
fuzzing because every consumer trusts it blindly: the Delta
RoaringBitmap deletion-vector codec, the Avro binary encoding, and
the protobuf wire format. All pure-Python round trips, no Spark."""

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_cassandra_collabfiltering_spark.sources import (
    avro_source as av,
    delta_dv as dv,
    proto_source as pr,
)

# ---------------------------------------------------------------- roaring

positions = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**16),       # array containers
        st.integers(min_value=0, max_value=2**33),       # multi 32-bit keys
        st.integers(min_value=2**62, max_value=2**63 - 1),
    ),
    max_size=300,
)


@settings(max_examples=150, deadline=None)
@given(positions)
def test_roaring_round_trip_property(ps):
    data = dv.serialize_positions(ps)
    assert dv.deserialize_positions(data) == sorted(set(ps))


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=4, max_size=64).map(lambda b: b[: len(b) - len(b) % 4]))
def test_b85_round_trip_property(raw):
    assert dv.b85_decode(dv.b85_encode(raw)) == raw


def test_dv_sidecar_spans_round_trip_concrete(tmp_path):
    import random

    rng = random.Random(8)
    many = [
        sorted(rng.sample(range(10**6), rng.randint(0, 400)))
        for _ in range(5)
    ]
    p = str(tmp_path / "dv.bin")
    spans = dv.write_dv_file(p, many)
    for ps, (off, size) in zip(many, spans):
        assert dv.read_dv_span(p, off, size) == sorted(set(ps))


# ---------------------------------------------------------------- avro

_AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": {"type": "array", "items": "int"}},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": "bytes"},
    ],
}

avro_rows = st.lists(
    st.fixed_dictionaries({
        "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.one_of(st.none(), st.text(max_size=20)),
        "c": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "d": st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            max_size=8,
        ),
        "e": st.booleans(),
        "f": st.binary(max_size=16),
    }),
    max_size=25,
)


@settings(max_examples=60, deadline=None)
@given(avro_rows, st.sampled_from(["null", "deflate"]))
def test_avro_round_trip_property(rows, codec):
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        av.write_avro(rows, _AVRO_SCHEMA, path, codec=codec,
                      rows_per_block=7)
        with open(path, "rb") as fh:
            got = list(av.parse_avro_bytes(fh.read(), file="p"))
        assert all(g["corrupt_reason"] is None for g in got)
        assert len(got) == len(rows)
        for g, r in zip(got, rows):
            assert g["a"] == r["a"] and g["b"] == r["b"]
            assert g["c"] == r["c"] and g["e"] == r["e"]
            assert list(g["d"]) == r["d"] and bytes(g["f"]) == r["f"]
    finally:
        os.remove(path)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_avro_parser_never_crashes_on_garbage(blob):
    # arbitrary bytes: every row is either clean or quarantined —
    # never an uncaught exception
    for row in av.parse_avro_bytes(blob, file="fuzz"):
        assert "corrupt_reason" in row


# ---------------------------------------------------------------- protobuf

_P_SCHEMA = {
    1: ("a", "int64"),
    2: ("b", "string"),
    3: ("c", "repeated sint64"),
    4: ("d", "double"),
    5: ("e", {1: ("x", "sint32"), 2: ("y", "bool")}),
}

proto_rows = st.lists(
    st.fixed_dictionaries({
        "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.one_of(st.none(), st.text(max_size=20)),
        "c": st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=-(2**62), max_value=2**62),
                min_size=1, max_size=6,
            ),
        ),
        "d": st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        "e": st.one_of(
            st.none(),
            st.fixed_dictionaries({
                "x": st.integers(min_value=-(2**31), max_value=2**31 - 1),
                "y": st.booleans(),
            }),
        ),
    }),
    max_size=20,
)


@settings(max_examples=80, deadline=None)
@given(proto_rows)
def test_proto_round_trip_property(rows):
    blob = b"".join(
        pr._enc_varint(len(m)) + m
        for m in (pr.encode_message(_P_SCHEMA, r) for r in rows)
    )
    got = list(pr.parse_delimited_bytes(blob, _P_SCHEMA, file="p"))
    assert all(g["corrupt_reason"] is None for g in got)
    assert len(got) == len(rows)
    for g, r in zip(got, rows):
        assert g["a"] == r["a"] and g["b"] == r["b"] and g["d"] == r["d"]
        assert g["c"] == r["c"]
        if r["e"] is None:
            assert g["e"] is None
        else:
            assert g["e"]["x"] == r["e"]["x"] and g["e"]["y"] == r["e"]["y"]


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=150))
def test_proto_parser_never_crashes_on_garbage(blob):
    for row in pr.parse_delimited_bytes(blob, _P_SCHEMA, file="fuzz"):
        assert "corrupt_reason" in row
