"""Fixed-width text source — the mainframe/legacy-extract ingest format
(COBOL copybook exports, bank/telco feeds): every record is one line,
every field a fixed byte range, no delimiters at all.

Scale shape: `spark.read.text` is newline-splittable, so a 100 TB feed
fans out across tasks like any text source; field extraction is pure
scan-local substring/trim/cast expressions (JVM, codegen — no Python,
no regex backtracking beyond an anchored digit check). Classification
follows the PERMISSIVE + quarantine contract shared with the JSONL and
WARC sources: a malformed line (wrong width, non-numeric digits in a
numeric field) is preserved raw in a corrupt-record column, never
dropped and never fatal.

No reference counterpart (its only file source is the ratings CSV,
CollabFilterCassandraDriver.java:95-96); driver-mandated ingest
breadth.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class FWField:
    """One fixed-width field: 1-based start position, byte length, and
    a dtype of 'string' (trimmed) or 'bigint' (trimmed, anchored-digit
    validated — a non-numeric payload quarantines the LINE, it does
    not silently become NULL)."""

    name: str
    start: int
    length: int
    dtype: str = "string"


def record_width(fields: list[FWField]) -> int:
    return max(f.start + f.length - 1 for f in fields)


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[FWField]
) -> tuple[DataFrame, DataFrame]:
    """Read a fixed-width file into (clean, quarantine) DataFrames.

    A line is CLEAN iff its length equals the layout width exactly and
    every bigint field holds only digits (optionally space-padded —
    the fixed-width convention for right-aligned numerics). Clean rows
    carry the parsed, trimmed, cast columns; quarantine rows carry the
    raw line in ``_corrupt_record`` (the JSONL source's contract, so
    downstream quarantine accounting is format-agnostic)."""
    width = record_width(fields)
    raw = spark.read.text(path)
    ok = F.length("value") == width
    for f in fields:
        if f.dtype == "bigint":
            ok = ok & F.trim(F.substring("value", f.start, f.length)).rlike(
                "^[0-9]+$"
            )
    cols = []
    for f in fields:
        c = F.trim(F.substring("value", f.start, f.length))
        cols.append(
            (c.cast("bigint") if f.dtype == "bigint" else c).alias(f.name)
        )
    clean = raw.filter(ok).select(*cols)
    quarantine = raw.filter(~ok).select(F.col("value").alias(CORRUPT_COL))
    return clean, quarantine
