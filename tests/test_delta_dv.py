"""The from-scratch Delta deletion-vector codec (sources/delta_dv.py):
RFC 1924 Base85, portable 64-bit RoaringBitmapArray serialization
(array / bitmap / run containers, both cookies), the sidecar size/CRC
framing and descriptor resolution. A hand-built run-container blob
pins decode of the one container kind the encoder never emits, so the
decoder is tested against the SPEC, not against our own writer."""

import struct
import zlib

import pytest

from spark_cassandra_collabfiltering_spark.sources import delta_dv as dv


def test_b85_round_trip_and_rfc1924_charset():
    raw = bytes(range(16))
    enc = dv.b85_encode(raw)
    assert len(enc) == 20
    assert dv.b85_decode(enc) == raw
    # spec vector: 4 zero bytes encode as '00000' in RFC 1924
    assert dv.b85_encode(b"\x00\x00\x00\x00") == "00000"
    with pytest.raises(ValueError):
        dv.b85_decode('"""""')  # not in the charset


@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [0, 1, 2, 3, 100, 65535],
        list(range(5000)),                      # bitmap container
        [i * 7 for i in range(4097)],           # > 4096 spread
        [0, 2**16, 2**16 + 1, 2**20, 2**31],    # many 16-bit keys
        [5, 2**32 + 5, 2**33 + 7, 2**40],       # many 32-bit buckets
        [2**63 - 1],                            # top of the long range
    ],
)
def test_roaring_round_trip(positions):
    data = dv.serialize_positions(positions)
    assert dv.deserialize_positions(data) == sorted(set(positions))


def test_hand_built_run_container_decodes():
    """SERIAL_COOKIE (12346) with a run container: [10, 14] ∪ {100} —
    built by hand per RoaringFormatSpec; the encoder never emits
    runs."""
    n = 1
    cookie = dv._SERIAL_COOKIE_RUN | ((n - 1) << 16)
    blob = struct.pack("<I", cookie)
    blob += b"\x01"                       # run-flag bitset: container 0
    blob += struct.pack("<HH", 0, 6 - 1)  # key 0, cardinality 6
    # n < NO_OFFSET_THRESHOLD -> no offsets
    blob += struct.pack("<H", 2)          # two runs
    blob += struct.pack("<HH", 10, 4)     # [10, 10+4]
    blob += struct.pack("<HH", 100, 0)    # [100]
    vals, p = dv._deserialize32(blob, 0)
    assert p == len(blob)
    assert vals == [10, 11, 12, 13, 14, 100]
    # wrapped in the 64-bit array + magic framing
    data = struct.pack("<I", dv.DV_MAGIC) + struct.pack("<Q", 1)
    data += struct.pack("<I", 3) + blob   # high key 3
    got = dv.deserialize_positions(data)
    assert got == [(3 << 32) | v for v in [10, 11, 12, 13, 14, 100]]


def test_sidecar_framing_crc_and_size_checks(tmp_path):
    p = str(tmp_path / "dv.bin")
    spans = dv.write_dv_file(p, [[1, 5, 9], list(range(100))])
    assert len(spans) == 2
    assert dv.read_dv_span(p, *spans[0]) == [1, 5, 9]
    assert dv.read_dv_span(p, *spans[1]) == list(range(100))
    # corrupt one data byte: CRC must catch it
    blob = bytearray(open(p, "rb").read())
    blob[spans[0][0] + 6] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_span(p, *spans[0])
    # the untouched second span still reads (per-DV framing isolates)
    assert dv.read_dv_span(p, *spans[1]) == list(range(100))


def test_descriptor_uuid_and_inline_round_trip(tmp_path):
    root = str(tmp_path)
    desc = dv.make_descriptor_uuid(root, [3, 7, 2**33])
    assert desc["storageType"] == "u" and desc["cardinality"] == 3
    assert dv.resolve_descriptor(root, desc) == [3, 7, 2**33]
    rel = dv.dv_uuid_relative_path(desc["pathOrInlineDv"])
    assert rel.startswith("deletion_vector_") and rel.endswith(".bin")
    inline = dv.make_descriptor_inline([0, 1, 2])
    assert inline["storageType"] == "i"
    assert dv.resolve_descriptor(root, inline) == [0, 1, 2]


def test_descriptor_size_mismatch_refuses(tmp_path):
    root = str(tmp_path)
    desc = dv.make_descriptor_uuid(root, [1, 2, 3])
    wrong = dict(desc, sizeInBytes=desc["sizeInBytes"] + 1)
    with pytest.raises(ValueError, match="size mismatch"):
        dv.resolve_descriptor(root, wrong)
