"""WARC source (sources/warc_source.py): the Content-Length record
walk must survive the planted traps — a body embedding the WARC magic
(shreds magic-splitting parsers), a corrupt Content-Length (quarantine
+ resync), an empty body — and the Spark mapInPandas path must emit
the same rows as the pure-Python walk over the committed fixture.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.sources import warc_source as wr  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "sample.warc",
)


def _records():
    with open(FIXTURE, "rb") as f:
        return list(wr.parse_warc_bytes(f.read(), file="fixture"))


def test_fixture_is_byte_stable():
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    import gen_warc_fixture

    with open(FIXTURE, "rb") as f:
        assert f.read() == gen_warc_fixture.build().encode("ascii")


def test_record_type_census():
    recs = _records()
    types = [r["warc_type"] for r in recs]
    assert types.count("response") == 5
    assert types.count("request") == 1
    assert types.count("warcinfo") == 1
    # two quarantines: the non-numeric Content-Length plant and the
    # r6 truncated-tail plant
    assert sum(1 for r in recs if r["corrupt_reason"]) == 2


def test_body_embedding_magic_is_not_split():
    recs = _records()
    trap = [r for r in recs if r["target_uri"] == "http://example.com/trap"]
    assert len(trap) == 1
    assert "WARC/1.0\r\n" in trap[0]["body"]
    assert trap[0]["corrupt_reason"] is None


def test_corrupt_length_quarantines_and_resyncs():
    recs = _records()
    bad = [r for r in recs if r["corrupt_reason"]]
    assert bad[0]["corrupt_reason"] == "bad_content_length"
    # the preserved evidence is the header block, magic included
    assert bad[0]["body"].startswith("WARC/1.0\r\n")
    assert "Content-Length: abc" in bad[0]["body"]
    # the record AFTER the corrupt one is recovered intact
    after = [r for r in recs if r["target_uri"] == "http://example.com/b"]
    assert len(after) == 1 and "recovered" in after[0]["body"]


def test_http_parse_fields():
    recs = {
        r["target_uri"]: r for r in _records() if r["warc_type"] == "response"
    }
    assert recs["http://example.com/a"]["http_status"] == 200
    assert recs["http://example.com/a"]["content_type"] == "text/html"
    assert recs["http://example.com/notfound"]["http_status"] == 404
    assert recs["http://example.com/empty"]["http_status"] == 204
    assert recs["http://example.com/empty"]["body"] == ""
    # request records carry the raw payload, no http fields
    req = [r for r in _records() if r["warc_type"] == "request"][0]
    assert req["http_status"] is None and req["body"].startswith("GET /a")


def test_trailing_garbage_and_truncated_header_quarantine():
    data = (
        b"garbage before the first record\r\n"
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\nno header end"
    )
    recs = list(wr.parse_warc_bytes(data))
    assert [r["corrupt_reason"] for r in recs] == [
        "no_magic",
        None,
        "truncated_header",
    ]
    assert recs[1]["warc_type"] == "metadata" and recs[1]["body"] == "ok"


def test_spark_read_matches_python_walk(spark):
    rows = (
        wr.read_warc(spark, FIXTURE)
        .orderBy("record_id", "corrupt_reason")
        .collect()
    )
    expected = sorted(
        _records(),
        key=lambda r: (
            r["record_id"] is not None,
            r["record_id"] or "",
            r["corrupt_reason"] is not None,
            r["corrupt_reason"] or "",
        ),
    )
    assert len(rows) == len(expected)
    got = {
        (r.record_id, r.warc_type, r.http_status, r.body, r.corrupt_reason)
        for r in rows
    }
    exp = {
        (
            r["record_id"],
            r["warc_type"],
            r["http_status"],
            r["body"],
            r["corrupt_reason"],
        )
        for r in expected
    }
    assert got == exp
    assert rows[0].file.endswith("sample.warc") or rows[-1].file.endswith(
        "sample.warc"
    )
