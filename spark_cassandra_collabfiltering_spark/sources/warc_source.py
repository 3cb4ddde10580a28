"""WARC source — the Common Crawl ingest format (ISO 28500), parsed
with a Content-Length record walk and corrupt-record quarantine.

This is the web-scale ingest surface of the mandated LLM-pipeline
extensions (no reference counterpart — the reference's only file
source is the ratings CSV, CollabFilterCassandraDriver.java:95-96).
Public shape: warcio / FastWARC readers driven file-parallel the way
cc_net and DataTrove fan Common Crawl out over Spark-like executors.

Scale design — why per-FILE parsing is the right Spark shape here:

- Common Crawl ships ~100k ``.warc.gz`` files per crawl (~1 GB each);
  gzip members make a single file non-splittable, so the production
  parallelism IS file-level parallelism: one task per file, 100k-wide.
  ``spark.read.format("binaryFile")`` + ``mapInPandas`` reproduces
  exactly that: the scan distributes files across tasks and the
  parser runs Arrow-batched per task, never on the driver.
- The parser walks ``Content-Length`` — NOT a split on the
  ``WARC/1.0`` magic. A response body may legally CONTAIN the magic
  (tests plant one); splitting on it shreds records. Only after a
  corrupt length does the parser fall back to a resync scan for the
  next magic, preserving the corrupt record's header block as
  quarantine evidence (the JSONL PERMISSIVE discipline,
  ``jsonl_source.split_corrupt``).
- Output rows are columnar and bounded: type/uri/date/status/
  content-type plus the payload body; downstream text gates
  (lang-id, quality, dedup) consume them scan-locally.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"WARC/1.0\r\n"
_HDR_END = b"\r\n\r\n"
_CL_RE = re.compile(rb"\r\nContent-Length: ([0-9]+)\r\n")
_TYPE_RE = re.compile(rb"\r\nWARC-Type: ([^\r\n]+)\r\n")
_ID_RE = re.compile(rb"\r\nWARC-Record-ID: ([^\r\n]+)\r\n")
_URI_RE = re.compile(rb"\r\nWARC-Target-URI: ([^\r\n]+)\r\n")
_DATE_RE = re.compile(rb"\r\nWARC-Date: ([^\r\n]+)\r\n")
_STATUS_RE = re.compile(rb"^HTTP/1\.[01] ([0-9]{3})")
_HTTP_CT_RE = re.compile(rb"\r\nContent-Type: ([^\r\n]+)\r\n")

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("body", StringType(), True),
        StructField("n_payload_bytes", LongType(), True),
        StructField("corrupt_reason", StringType(), True),
    ]
)


def _grp(rx: re.Pattern, blob: bytes) -> str | None:
    m = rx.search(blob)
    return m.group(1).decode("utf-8", "replace") if m else None


def parse_warc_bytes(data: bytes, file: str = "") -> Iterator[dict]:
    """Walk one WARC file's bytes record by record. Pure function —
    shared by the Spark mapInPandas task and the unit tests; the
    DuckDB oracle re-implements the identical walk as a recursive CTE.

    Per record: locate the header block (up to CRLFCRLF), read
    Content-Length, slice exactly that many payload bytes, skip the
    two-CRLF record separator. A missing/non-numeric length yields a
    quarantine row carrying the header block, then a RESYNC scan to
    the next magic. Leading garbage (a resync landing short) also
    quarantines up to the next magic. A record whose declared length
    exceeds the remaining bytes (truncated file tail) quarantines with
    ``corrupt_reason='truncated_payload'`` and the byte count actually
    present — never a silently-short clean row.
    """
    p, n = 0, len(data)
    while p < n:
        if not data.startswith(_MAGIC, p):
            q = data.find(_MAGIC, p + 1)
            end = q if q != -1 else n
            yield {
                "file": file, "warc_type": None, "record_id": None,
                "target_uri": None, "warc_date": None, "http_status": None,
                "content_type": None,
                "body": data[p:end].decode("utf-8", "replace"),
                "n_payload_bytes": None, "corrupt_reason": "no_magic",
            }
            p = end
            continue
        he = data.find(_HDR_END, p)
        if he == -1:
            yield {
                "file": file, "warc_type": None, "record_id": None,
                "target_uri": None, "warc_date": None, "http_status": None,
                "content_type": None,
                "body": data[p:].decode("utf-8", "replace"),
                "n_payload_bytes": None,
                "corrupt_reason": "truncated_header",
            }
            return
        header = data[p:he]
        m = _CL_RE.search(header + b"\r\n")
        if m is None:
            yield {
                "file": file, "warc_type": None, "record_id": None,
                "target_uri": None, "warc_date": None, "http_status": None,
                "content_type": None,
                "body": header.decode("utf-8", "replace"),
                "n_payload_bytes": None,
                "corrupt_reason": "bad_content_length",
            }
            q = data.find(_MAGIC, he + 4)
            p = q if q != -1 else n
            continue
        cl = int(m.group(1))
        if n - (he + 4) < cl:
            # Truncated file tail: the header promises cl payload bytes
            # but fewer remain (a dying writer). Yielding the short
            # slice as a clean row would silently violate the
            # quarantine contract — preserve the header block for
            # replay and report the bytes actually present.
            yield {
                "file": file, "warc_type": None, "record_id": None,
                "target_uri": None, "warc_date": None, "http_status": None,
                "content_type": None,
                "body": header.decode("utf-8", "replace"),
                "n_payload_bytes": n - (he + 4),
                "corrupt_reason": "truncated_payload",
            }
            return
        payload = data[he + 4 : he + 4 + cl]
        wtype = _grp(_TYPE_RE, header)
        status, ctype, body = None, None, payload
        if wtype == "response":
            sm = _STATUS_RE.match(payload)
            status = int(sm.group(1)) if sm else None
            hbe = payload.find(_HDR_END)
            if hbe != -1:
                ctype = _grp(_HTTP_CT_RE, payload[:hbe] + b"\r\n")
                body = payload[hbe + 4 :]
        yield {
            "file": file, "warc_type": wtype,
            "record_id": _grp(_ID_RE, header),
            "target_uri": _grp(_URI_RE, header),
            "warc_date": _grp(_DATE_RE, header),
            "http_status": status, "content_type": ctype,
            "body": body.decode("utf-8", "replace"),
            "n_payload_bytes": cl, "corrupt_reason": None,
        }
        p = he + 4 + cl + 4


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into rows: one per record, corrupt records
    quarantined in-band (``corrupt_reason`` non-null, header block
    preserved in ``body``). File-parallel: the binaryFile scan
    distributes whole files across tasks; parsing is Arrow-batched
    ``mapInPandas`` inside each task (module docstring for why this
    is the honest Common Crawl shape)."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                r
                for f, blob in zip(pdf["path"], pdf["content"])
                for r in parse_warc_bytes(bytes(blob), file=str(f))
            ]
            yield pd.DataFrame(
                rows, columns=[fld.name for fld in WARC_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_records, quarantined) — quarantine keeps the preserved
    header block in ``body`` for replay, the JSONL discipline."""
    return (
        df.filter(F.col("corrupt_reason").isNull()),
        df.filter(F.col("corrupt_reason").isNotNull()),
    )
