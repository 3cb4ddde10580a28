#!/usr/bin/env python
"""Generate the committed WARC ingest fixture (fixtures/sample.warc) —
a deterministic ISO 28500 WARC file with planted records, used by the
`warc_ingest` registry query and tests/test_warc.py.

The fixture is COMMITTED (not generated at query time) so the Spark
mapInPandas parser and the DuckDB recursive-CTE oracle read the exact
same bytes. Re-running this script reproduces the file byte-for-byte
(pure function of the record list; no RNG, no timestamps). ASCII-only
by construction so that DuckDB's VARCHAR character offsets equal byte
offsets and the oracle's substr/strpos walk is sound.

Planted shapes (the cases a Common Crawl-scale ingest actually hits):

- warcinfo record (metadata, no HTTP payload)
- valid response records (HTTP/1.1 status line + headers + body)
- a response whose BODY contains the literal bytes "WARC/1.0\\r\\n" —
  the record-boundary trap: any parser that splits on the magic
  instead of walking Content-Length shreds this record
- a request record (must be typed, not mistaken for a response)
- a CORRUPT record with a non-numeric Content-Length — the
  length-walk breaks; the parser must quarantine it and resync at the
  next real record boundary
- a valid response AFTER the corrupt one (resync must recover it)
- a response with an EMPTY body (Content-Length covers headers only)
- a TRUNCATED final record: Content-Length promises more bytes than
  remain in the file (a dying writer mid-payload) — must quarantine
  as 'truncated_payload', never yield a silently-short clean row
"""

from __future__ import annotations

import os

CRLF = "\r\n"


def _record(headers: list[tuple[str, str]], payload: str,
            content_length: str | None = None) -> str:
    cl = len(payload) if content_length is None else content_length
    head = "WARC/1.0" + CRLF
    head += "".join(f"{k}: {v}{CRLF}" for k, v in headers)
    head += f"Content-Length: {cl}{CRLF}"
    return head + CRLF + payload + CRLF + CRLF


def _http(status: str, ctype: str, body: str) -> str:
    return (
        f"HTTP/1.1 {status}{CRLF}"
        f"Content-Type: {ctype}{CRLF}"
        f"Server: fixture{CRLF}{CRLF}" + body
    )


def build() -> str:
    recs = []
    recs.append(_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
         ("WARC-Date", "2024-01-01T00:00:00Z")],
        "software: fixture-writer/1.0",
    ))
    recs.append(_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000001>"),
         ("WARC-Target-URI", "http://example.com/a"),
         ("WARC-Date", "2024-01-01T00:00:01Z")],
        _http("200 OK", "text/html",
              "<html><body>hello world from page a</body></html>"),
    ))
    # the record-boundary trap: body embeds the WARC magic
    recs.append(_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000002>"),
         ("WARC-Target-URI", "http://example.com/trap"),
         ("WARC-Date", "2024-01-01T00:00:02Z")],
        _http("200 OK", "text/plain",
              "tutorial: a warc record starts with WARC/1.0\r\n"
              "followed by headers. do not split on the magic."),
    ))
    recs.append(_record(
        [("WARC-Type", "request"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000003>"),
         ("WARC-Target-URI", "http://example.com/a"),
         ("WARC-Date", "2024-01-01T00:00:01Z")],
        f"GET /a HTTP/1.1{CRLF}Host: example.com{CRLF}{CRLF}",
    ))
    recs.append(_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000004>"),
         ("WARC-Target-URI", "http://example.com/notfound"),
         ("WARC-Date", "2024-01-01T00:00:03Z")],
        _http("404 Not Found", "text/html", "<html>gone</html>"),
    ))
    # corrupt: non-numeric Content-Length breaks the length walk
    recs.append(_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-00000000dead>"),
         ("WARC-Target-URI", "http://example.com/corrupt"),
         ("WARC-Date", "2024-01-01T00:00:04Z")],
        _http("200 OK", "text/html", "<html>truncated by a dying writer"),
        content_length="abc",
    ))
    # resync target: must be recovered after the corrupt record
    recs.append(_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000005>"),
         ("WARC-Target-URI", "http://example.com/b"),
         ("WARC-Date", "2024-01-01T00:00:05Z")],
        _http("200 OK", "text/html",
              "<html><body>recovered after the corrupt record</body></html>"),
    ))
    recs.append(_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000006>"),
         ("WARC-Target-URI", "http://example.com/empty"),
         ("WARC-Date", "2024-01-01T00:00:06Z")],
        _http("204 No Content", "text/plain", ""),
    ))
    # truncated tail: the header promises 4096 payload bytes but the
    # file ends after a short fragment — the dying-writer case
    recs.append(
        "WARC/1.0" + CRLF
        + "WARC-Type: response" + CRLF
        + "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-0000000tail>"
        + CRLF
        + "WARC-Target-URI: http://example.com/truncated" + CRLF
        + "WARC-Date: 2024-01-01T00:00:07Z" + CRLF
        + "Content-Length: 4096" + CRLF + CRLF
        + _http("200 OK", "text/html", "<html>cut off mid-")
    )
    return "".join(recs)


if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "sample.warc",
    )
    data = build()
    assert all(ord(c) < 128 for c in data), "fixture must stay ASCII"
    with open(out, "wb") as f:
        f.write(data.encode("ascii"))
    print(f"wrote {out} ({len(data)} bytes)")
