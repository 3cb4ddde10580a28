"""Avro Object Container ingest, from scratch (r8 — VERDICT r7
"What's missing" #4: Avro is the other big pipeline interchange
format, and the spark-avro jar is not in this container; the format
itself is a public specification, so the reader is built from it).

Implemented per the Avro 1.11 spec (container format + binary
encoding), no third-party code:

- container: magic ``Obj\\x01``, file-metadata map (``avro.schema``
  JSON, ``avro.codec``), 16-byte sync marker, then data blocks of
  (row count, byte size, serialized rows, sync). ``null`` and
  ``deflate`` (raw RFC 1951) codecs.
- binary encoding: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, 1-byte boolean, index-
  prefixed unions, block-encoded arrays and maps (including the
  negative-count byte-size form writers may emit), enum indexes,
  fixed, nested records by recursion.
- logical types: ``date`` (int days), ``timestamp-millis`` /
  ``timestamp-micros`` (long) map to DATE/TIMESTAMP columns,
  ``decimal`` (bytes/fixed, big-endian two's-complement unscaled)
  maps to DECIMAL(p, s); others surface as their underlying
  primitive. Non-nullable multi-branch unions and unknown codecs
  REFUSE loudly (quarantine) rather than guess.
- corrupt handling: the JSONL/WARC PERMISSIVE discipline — a block
  whose sync marker or row bytes do not check out quarantines as one
  in-band row (``corrupt_reason`` set, clean rows keep flowing) and
  the walk RESYNCS by scanning for the next 16-byte sync marker, the
  exact recovery the sync marker exists for.
- schema RESOLUTION (r9, the spec's "Schema Resolution" section):
  ``read_avro(reader_schema_json=...)`` resolves each file's own
  writer schema to one reader schema — field matching by name or
  alias, reader-only fields filled from defaults, writer-only fields
  decoded and discarded, numeric promotions and string<->bytes,
  unions by first-resolvable-branch, enums falling back to the
  reader's default symbol. Anything unresolvable refuses at BUILD
  time and the file quarantines whole (``bad_schema``) — an evolved
  lake reads as one reader-shaped frame, never a misdecoded row.

Scale shape (same argument as sources/warc_source.py): Avro files in
a lake land thousands-wide; a deflate'd container is effectively
non-splittable without block-index cooperation, so file-level
parallelism is the production parallelism — ``binaryFile`` scan
distributes whole files across tasks, Arrow ``mapInPandas`` decodes
per task, the driver only peeks ONE header for the schema. Encoder
and decoder are independent code paths, so the registry query's
encode->decode round trip over real testdata is a genuine decoder
test, hash-matched against the closed-form oracle.

No reference counterpart (the reference's only file source is the
ratings CSV, CollabFilterCassandraDriver.java:95-96); mandated
LLM-pipeline ingest surface.
"""

from __future__ import annotations

import datetime
import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary-encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _read_long(buf: bytes, p: int) -> "tuple[int, int]":
    """Zigzag little-endian base-128 varint (int and long share it)."""
    shift, acc = 0, 0
    while True:
        if p >= len(buf):
            raise ValueError("varint past end of buffer")
        b = buf[p]
        p += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1), p


def _read_len_bytes(buf: bytes, p: int) -> "tuple[bytes, int]":
    n, p = _read_long(buf, p)
    if n < 0 or p + n > len(buf):
        raise ValueError(f"bad byte-length {n}")
    return buf[p : p + n], p + n


# ---------------------------------------------------------------------------
# schema -> (Spark type, decoder) translation
# ---------------------------------------------------------------------------

_EPOCH = datetime.date(1970, 1, 1)


def _prim(avro_name: str):
    if avro_name == "null":
        return T.NullType(), lambda buf, p: (None, p)
    if avro_name == "boolean":
        def rb(buf, p):
            if p >= len(buf):
                raise ValueError("boolean past end")
            return buf[p] == 1, p + 1
        return T.BooleanType(), rb
    if avro_name == "int":
        return T.IntegerType(), _read_long
    if avro_name == "long":
        return T.LongType(), _read_long
    if avro_name == "float":
        def rf(buf, p):
            if p + 4 > len(buf):
                raise ValueError("float past end")
            return struct.unpack_from("<f", buf, p)[0], p + 4
        return T.FloatType(), rf
    if avro_name == "double":
        def rd(buf, p):
            if p + 8 > len(buf):
                raise ValueError("double past end")
            return struct.unpack_from("<d", buf, p)[0], p + 8
        return T.DoubleType(), rd
    if avro_name == "bytes":
        return T.BinaryType(), lambda buf, p: _read_len_bytes(buf, p)
    if avro_name == "string":
        def rs(buf, p):
            raw, p = _read_len_bytes(buf, p)
            return raw.decode("utf-8"), p
        return T.StringType(), rs
    raise ValueError(f"unsupported Avro type {avro_name!r}")


def _logical(schema: dict):
    """date / timestamp-millis / timestamp-micros decorate int/long;
    decimal decorates bytes/fixed (big-endian two's-complement
    unscaled value, per the spec)."""
    import decimal as _dec

    lt = schema.get("logicalType")
    base = schema.get("type")
    if lt == "decimal" and base in ("bytes", "fixed"):
        prec = int(schema["precision"])
        scale = int(schema.get("scale", 0))
        size = int(schema["size"]) if base == "fixed" else None

        def rdec(buf, p):
            if size is not None:
                if p + size > len(buf):
                    raise ValueError("fixed decimal past end")
                raw, p2 = buf[p : p + size], p + size
            else:
                raw, p2 = _read_len_bytes(buf, p)
            unscaled = int.from_bytes(raw, "big", signed=True)
            return _dec.Decimal(unscaled).scaleb(-scale), p2

        return T.DecimalType(prec, scale), rdec
    if lt == "date" and base == "int":
        def rdte(buf, p):
            days, p = _read_long(buf, p)
            return _EPOCH + datetime.timedelta(days=days), p
        return T.DateType(), rdte
    if lt in ("timestamp-millis", "timestamp-micros") and base == "long":
        unit = 1_000 if lt == "timestamp-millis" else 1_000_000
        def rts(buf, p):
            v, p = _read_long(buf, p)
            return (
                datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=v * (1_000_000 // unit)),
                p,
            )
        return T.TimestampType(), rts
    return None


def _make_reader(schema) -> "tuple[T.DataType, object]":
    """(Spark type, decoder fn(buf, p) -> (python value, p)) for one
    Avro schema node. Recursion handles nesting; refusals are loud."""
    if isinstance(schema, str):
        return _prim(schema)
    if isinstance(schema, list):  # union
        if len(schema) == 2 and "null" in schema:
            other = schema[0] if schema[1] == "null" else schema[1]
            dt, rd = _make_reader(other)
            null_idx = schema.index("null")
            def ru(buf, p):
                idx, p = _read_long(buf, p)
                if idx == null_idx:
                    return None, p
                if idx != 1 - null_idx:
                    raise ValueError(f"union index {idx} out of range")
                return rd(buf, p)
            return dt, ru
        raise ValueError(
            f"unsupported non-nullable union {schema!r} (only "
            "[null, T] unions map to a column type)"
        )
    t = schema["type"]
    log = _logical(schema)
    if log is not None:
        return log
    if t == "record":
        names, dts, rds = [], [], []
        for f in schema["fields"]:
            dt, rd = _make_reader(f["type"])
            names.append(f["name"])
            dts.append(dt)
            rds.append(rd)
        stype = T.StructType(
            [T.StructField(n, dt, True) for n, dt in zip(names, dts)]
        )
        def rr(buf, p):
            out = {}
            for n, rd in zip(names, rds):
                out[n], p = rd(buf, p)
            return out, p
        return stype, rr
    if t == "enum":
        symbols = list(schema["symbols"])
        def re_(buf, p):
            i, p = _read_long(buf, p)
            if not 0 <= i < len(symbols):
                raise ValueError(f"enum index {i} out of range")
            return symbols[i], p
        return T.StringType(), re_
    if t == "fixed":
        size = int(schema["size"])
        def rfix(buf, p):
            if p + size > len(buf):
                raise ValueError("fixed past end")
            return buf[p : p + size], p + size
        return T.BinaryType(), rfix
    if t == "array":
        idt, ird = _make_reader(schema["items"])
        def ra(buf, p):
            out = []
            while True:
                n, p = _read_long(buf, p)
                if n == 0:
                    return out, p
                if n < 0:  # negative form: byte size follows
                    n = -n
                    _sz, p = _read_long(buf, p)
                for _ in range(n):
                    v, p = ird(buf, p)
                    out.append(v)
        return T.ArrayType(idt, True), ra
    if t == "map":
        vdt, vrd = _make_reader(schema["values"])
        def rm(buf, p):
            out = {}
            while True:
                n, p = _read_long(buf, p)
                if n == 0:
                    return out, p
                if n < 0:
                    n = -n
                    _sz, p = _read_long(buf, p)
                for _ in range(n):
                    kraw, p = _read_len_bytes(buf, p)
                    v, p = vrd(buf, p)
                    out[kraw.decode("utf-8")] = v
        return T.MapType(T.StringType(), vdt, True), rm
    return _prim(t)  # {"type": "long"} wrapper form


# ---------------------------------------------------------------------------
# schema RESOLUTION (the spec's "Schema Resolution" section): decode
# WRITER bytes into READER shape — field matching by name or alias,
# reader-only fields filled from their defaults, writer-only fields
# decoded and discarded, numeric promotions (int->long/float/double,
# long->float/double, float->double) and string<->bytes, unions by
# first-match, enums falling back to the reader's default symbol.
# Everything unresolvable refuses loudly at BUILD time (never a
# misdecoded row); per-datum branch mismatches raise at decode and
# quarantine through the normal corrupt-block path.
# ---------------------------------------------------------------------------

_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}
_PRIM_NAMES = {
    "null", "boolean", "int", "long", "float", "double", "bytes",
    "string",
}


def _tname(s) -> str:
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"]


def _has_logical(s) -> bool:
    return isinstance(s, dict) and "logicalType" in s


def _names_match(w: dict, r: dict) -> bool:
    """Named types match on equal name or the reader aliasing the
    writer's name (short-name comparison; namespaces in this repo's
    fixtures are unused)."""
    wn, rn = w.get("name"), r.get("name")
    if wn is None or rn is None or wn == rn:
        return True
    return wn in (r.get("aliases") or ())


def _resolves(w, r) -> bool:
    """Shallow can-this-pair-resolve check (union branch selection)."""
    wn, rn = _tname(w), _tname(r)
    if wn == "union" or rn == "union":
        return True  # handled structurally by _make_resolver
    if wn in _PRIM_NAMES and rn in _PRIM_NAMES:
        return wn == rn or rn in _PROMOTIONS.get(wn, ())
    if wn != rn:
        return False
    if wn in ("record", "enum", "fixed"):
        return _names_match(w, r)
    return True  # array/map/wrapped prim: recursion decides


def _default_value(r, d):
    """A reader field's JSON default as the python value decode would
    produce. Union defaults type against the FIRST branch (spec)."""
    if isinstance(r, list):
        return None if d is None else _default_value(r[0], d)
    tn = _tname(r)
    if _has_logical(r):
        log = _logical(r)
        if log is not None and r.get("logicalType") == "date":
            return _EPOCH + datetime.timedelta(days=int(d))
        raise ValueError(
            f"unsupported default for logical type {r!r}"
        )
    if tn == "null":
        return None
    if tn == "bytes" or tn == "fixed":
        # the spec encodes byte defaults as codepoints 0-255
        return d.encode("latin-1") if isinstance(d, str) else bytes(d)
    if tn in ("int", "long"):
        return int(d)
    if tn in ("float", "double"):
        return float(d)
    if tn == "boolean":
        return bool(d)
    if tn in ("string", "enum"):
        return d
    if tn == "array":
        return [_default_value(r["items"], x) for x in d]
    if tn == "map":
        return {k: _default_value(r["values"], v) for k, v in d.items()}
    if tn == "record":
        return {
            f["name"]: _default_value(f["type"], d.get(f["name"], f.get("default")))
            for f in r["fields"]
        }
    raise ValueError(f"unsupported default for reader type {r!r}")


def _make_skip(s):
    """A discard decoder (None, p) for writer-only fields — handles
    ANY union shape, since a skipped field never becomes a column."""
    if isinstance(s, list):
        subs = [_make_skip(b) for b in s]

        def sku(buf, p):
            i, p = _read_long(buf, p)
            if not 0 <= i < len(subs):
                raise ValueError(f"union index {i} out of range")
            return subs[i](buf, p)

        return sku
    _dt, rd = _make_reader(s)

    def sk(buf, p):
        _v, p = rd(buf, p)
        return None, p

    return sk


def _make_resolver(w, r):
    """(Spark type, decoder) that reads WRITER-encoded bytes and
    yields READER-shaped values."""
    if json.dumps(w, sort_keys=True) == json.dumps(r, sort_keys=True):
        return _make_reader(r)  # identical subtree: plain decode
    wn, rn = _tname(w), _tname(r)

    # writer union: decode the branch index, then resolve that branch
    if isinstance(w, list):
        if isinstance(r, list):
            dt, _ = _make_reader(r)  # enforces the [null, T] column rule

            def branch_resolver(b):
                for rb in r:
                    if _resolves(b, rb):
                        return _make_resolver(b, rb)[1]
                return None
        else:
            dt, _ = _make_reader(r) if rn != "null" else (T.NullType(), None)

            def branch_resolver(b):
                return (
                    _make_resolver(b, r)[1] if _resolves(b, r) else None
                )

        rds = [branch_resolver(b) for b in w]
        if all(x is None for x in rds):
            raise ValueError(f"no writer branch of {w!r} resolves to {r!r}")

        def ru(buf, p):
            idx, p = _read_long(buf, p)
            if not 0 <= idx < len(rds):
                raise ValueError(f"union index {idx} out of range")
            rd = rds[idx]
            if rd is None:
                raise ValueError(
                    f"writer branch {w[idx]!r} does not resolve to reader"
                )
            return rd(buf, p)

        return dt, ru

    # reader union, writer not: the writer value types against the
    # first resolvable reader branch
    if isinstance(r, list):
        dt, _ = _make_reader(r)
        for rb in r:
            if _resolves(w, rb):
                _dt2, rd = _make_resolver(w, rb)
                return dt, rd
        raise ValueError(f"writer {w!r} resolves to no branch of {r!r}")

    if _has_logical(w) or _has_logical(r):
        raise ValueError(
            f"cannot resolve differing logical types {w!r} -> {r!r}"
        )

    if wn in _PRIM_NAMES and rn in _PRIM_NAMES:
        rdt, _rrd = _make_reader(rn)
        _wdt, wrd = _make_reader(wn)
        if wn == rn:
            return rdt, wrd
        if rn not in _PROMOTIONS.get(wn, ()):
            raise ValueError(f"no promotion {wn} -> {rn}")
        if wn == "string" and rn == "bytes":
            conv = lambda v: v.encode("utf-8")  # noqa: E731
        elif wn == "bytes" and rn == "string":
            conv = lambda v: v.decode("utf-8")  # noqa: E731
        elif rn in ("float", "double"):
            conv = float
        else:  # int -> long
            conv = int

        def rp(buf, p):
            v, p = wrd(buf, p)
            return conv(v), p

        return rdt, rp

    if wn != rn:
        raise ValueError(f"cannot resolve {wn} -> {rn}")
    if wn in ("record", "enum", "fixed") and not _names_match(w, r):
        raise ValueError(
            f"named types do not match: {w.get('name')} -> "
            f"{r.get('name')} (no alias)"
        )

    if wn == "record":
        rfields = list(r["fields"])
        by_name = {f["name"]: f for f in rfields}
        for f in rfields:
            for a in f.get("aliases") or ():
                by_name.setdefault(a, f)
        steps = []  # (reader field name | None, decoder)
        matched = set()
        for wf in w["fields"]:
            rf = by_name.get(wf["name"])
            if rf is None or id(rf) in matched:
                steps.append((None, _make_skip(wf["type"])))
            else:
                matched.add(id(rf))
                _dt, rd = _make_resolver(wf["type"], rf["type"])
                steps.append((rf["name"], rd))
        defaults = {}
        for rf in rfields:
            if id(rf) not in matched:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} missing from "
                        "writer and has no default"
                    )
                defaults[rf["name"]] = _default_value(
                    rf["type"], rf["default"]
                )
        dts = [_make_reader(f["type"])[0] for f in rfields]
        stype = T.StructType(
            [
                T.StructField(f["name"], dt, True)
                for f, dt in zip(rfields, dts)
            ]
        )

        def rr(buf, p):
            out = dict(defaults)
            for name, rd in steps:
                v, p = rd(buf, p)
                if name is not None:
                    out[name] = v
            return out, p

        return stype, rr

    if wn == "enum":
        wsyms = list(w["symbols"])
        rsyms = set(r["symbols"])
        fallback = r.get("default")

        def re_(buf, p):
            i, p = _read_long(buf, p)
            if not 0 <= i < len(wsyms):
                raise ValueError(f"enum index {i} out of range")
            s = wsyms[i]
            if s in rsyms:
                return s, p
            if fallback is not None:
                return fallback, p
            raise ValueError(
                f"writer enum symbol {s!r} absent from reader (no default)"
            )

        return T.StringType(), re_

    if wn == "fixed":
        if int(w["size"]) != int(r["size"]):
            raise ValueError("fixed sizes differ")
        return _make_reader(r)

    if wn == "array":
        idt, ird = _make_resolver(w["items"], r["items"])

        def ra(buf, p):
            out = []
            while True:
                n, p = _read_long(buf, p)
                if n == 0:
                    return out, p
                if n < 0:
                    n = -n
                    _sz, p = _read_long(buf, p)
                for _ in range(n):
                    v, p = ird(buf, p)
                    out.append(v)

        return T.ArrayType(idt, True), ra

    if wn == "map":
        vdt, vrd = _make_resolver(w["values"], r["values"])

        def rm(buf, p):
            out = {}
            while True:
                n, p = _read_long(buf, p)
                if n == 0:
                    return out, p
                if n < 0:
                    n = -n
                    _sz, p = _read_long(buf, p)
                for _ in range(n):
                    kraw, p = _read_len_bytes(buf, p)
                    v, p = vrd(buf, p)
                    out[kraw.decode("utf-8")] = v

        return T.MapType(T.StringType(), vdt, True), rm

    # wrapped primitive dicts ({"type": "long"}) recurse as names
    return _make_resolver(wn, rn)


def avro_spark_schema(schema_json: str) -> T.StructType:
    """The Spark schema an Avro container's rows decode to (top-level
    record required), plus the ingest bookkeeping columns."""
    schema = json.loads(schema_json)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    stype, _rd = _make_reader(schema)
    return T.StructType(
        [T.StructField("file", T.StringType(), True)]
        + list(stype.fields)
        + [T.StructField("corrupt_reason", T.StringType(), True)]
    )


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------


def _read_meta_map(buf: bytes, p: int) -> "tuple[dict, int]":
    out = {}
    while True:
        n, p = _read_long(buf, p)
        if n == 0:
            return out, p
        if n < 0:
            n = -n
            _sz, p = _read_long(buf, p)
        for _ in range(n):
            k, p = _read_len_bytes(buf, p)
            v, p = _read_len_bytes(buf, p)
            out[k.decode("utf-8")] = v


def parse_avro_bytes(
    data: bytes,
    file: str = "",
    schema_json: "str | None" = None,
    reader_schema_json: "str | None" = None,
) -> Iterator[dict]:
    """Walk one container's bytes. Clean rows carry the record fields;
    corrupt blocks quarantine in-band (one row, fields None,
    ``corrupt_reason`` set) and the walk resyncs on the 16-byte sync
    marker. ``schema_json`` overrides the embedded schema (a multi-file
    scan decodes every file under the FIRST file's schema so the
    output is one uniform frame; a file whose own schema diverges
    fails its blocks' decode and quarantines — never silently
    misdecoded). ``reader_schema_json`` instead RESOLVES each file's
    own writer schema to the given reader schema per the spec's
    resolution rules (aliases, defaults, promotions) — the
    schema-evolution read path; an unresolvable file quarantines
    whole (``bad_schema``), never misdecodes."""
    def bad(reason: str) -> dict:
        return {"file": file, "corrupt_reason": reason}

    if not data.startswith(MAGIC):
        yield bad("no_magic")
        return
    try:
        meta, p = _read_meta_map(data, len(MAGIC))
    except ValueError as exc:
        yield bad(f"bad_header:{exc}")
        return
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        yield bad(f"unsupported_codec:{codec}")
        return
    sj = schema_json or meta.get("avro.schema", b"").decode("utf-8")
    try:
        schema = json.loads(sj)
        if reader_schema_json is not None:
            # schema-evolution path: decode WRITER bytes (the file's
            # own schema) into the READER shape via spec resolution.
            rschema = json.loads(reader_schema_json)
            _dt, reader = _make_resolver(schema, rschema)
            field_names = [f["name"] for f in rschema["fields"]]
        else:
            _dt, reader = _make_reader(schema)
            field_names = [f["name"] for f in schema["fields"]]
    except Exception as exc:  # noqa: BLE001 — quarantine contract:
        # the build path walks UNTRUSTED schema json; _default_value /
        # _make_resolver can raise TypeError/AttributeError on
        # malformed reader defaults (int(None), bytes() on a non-str),
        # and those must quarantine the file as bad_schema, never
        # crash the whole mapInPandas task (r9 ADVICE)
        yield bad(f"bad_schema:{exc}")
        return
    if p + 16 > len(data):
        yield bad("truncated_header")
        return
    sync = data[p : p + 16]
    p += 16

    while p < len(data):
        block_start = p
        try:
            nrows, p = _read_long(data, p)
            nbytes, p = _read_long(data, p)
            if nrows < 0 or nbytes < 0 or p + nbytes + 16 > len(data):
                raise ValueError(f"bad block header ({nrows}, {nbytes})")
            payload = data[p : p + nbytes]
            p += nbytes
            if data[p : p + 16] != sync:
                raise ValueError("sync marker mismatch")
            p += 16
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            rows, q = [], 0
            for _ in range(nrows):
                rec, q = reader(payload, q)
                rows.append(rec)
            if q != len(payload):
                raise ValueError(f"{len(payload) - q} trailing bytes")
        except (ValueError, zlib.error) as exc:
            yield bad(f"corrupt_block:{exc}")
            # resync: the 16-byte marker exists exactly for this scan
            nxt = data.find(sync, block_start + 1)
            if nxt == -1:
                return
            p = nxt + 16
            continue
        for rec in rows:
            row = {"file": file, "corrupt_reason": None}
            for n in field_names:
                row[n] = rec.get(n)
            yield row


def read_avro(
    spark: SparkSession,
    path: str,
    schema_json: "str | None" = None,
    reader_schema_json: "str | None" = None,
) -> DataFrame:
    """Read Avro container file(s) into rows, file-parallel: the
    binaryFile scan distributes whole files across tasks, decoding is
    Arrow-batched ``mapInPandas`` inside each task, corrupt blocks
    quarantine in-band. The driver peeks ONE header for the schema
    (or takes ``schema_json``); every file decodes under that schema
    so the frame is uniform. ``reader_schema_json`` instead applies
    the spec's schema-resolution rules per FILE: each container's own
    writer schema is resolved to the given reader schema (aliases,
    defaults, numeric promotions), so a lake written across schema
    versions reads as one reader-shaped frame; a file that cannot
    resolve quarantines whole rather than misdecoding."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    if reader_schema_json is not None:
        if schema_json is not None:
            raise ValueError(
                "pass schema_json (uniform decode) OR reader_schema_json "
                "(per-file resolution), not both"
            )
        out_schema = avro_spark_schema(reader_schema_json)
    else:
        if schema_json is None:
            head = files.select("path", "content").first()
            if head is None:
                raise FileNotFoundError(f"no files match {path}")
            blob = bytes(head["content"])
            if not blob.startswith(MAGIC):
                raise ValueError(f"{head['path']} is not an Avro container")
            meta, _p = _read_meta_map(blob, len(MAGIC))
            schema_json = meta["avro.schema"].decode("utf-8")
        out_schema = avro_spark_schema(schema_json)
    cols = [f.name for f in out_schema.fields]

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                r
                for f, blob in zip(pdf["path"], pdf["content"])
                for r in parse_avro_bytes(
                    bytes(blob),
                    file=str(f),
                    schema_json=schema_json,
                    reader_schema_json=reader_schema_json,
                )
            ]
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(decode, out_schema)


def split_corrupt(df: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """(clean, quarantined) — the JSONL/WARC discipline."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.col("corrupt_reason").isNull()).drop("corrupt_reason"),
        df.filter(F.col("corrupt_reason").isNotNull()),
    )


# ---------------------------------------------------------------------------
# writer — the fixture generator / export path. DELIBERATELY a
# different code shape from the reader (per-type encoder closures,
# single-chunk array/map blocks, positive-count form only) so an
# encode->decode round trip genuinely tests the decoder.
# ---------------------------------------------------------------------------


def _zz(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_len_bytes(raw: bytes) -> bytes:
    return _zz(len(raw)) + raw


def _make_writer(schema):
    if isinstance(schema, str):
        if schema == "null":
            return lambda v: b""
        if schema == "boolean":
            return lambda v: b"\x01" if v else b"\x00"
        if schema in ("int", "long"):
            return _zz
        if schema == "float":
            return lambda v: struct.pack("<f", v)
        if schema == "double":
            return lambda v: struct.pack("<d", v)
        if schema == "bytes":
            return lambda v: _enc_len_bytes(bytes(v))
        if schema == "string":
            return lambda v: _enc_len_bytes(v.encode("utf-8"))
        raise ValueError(f"unsupported Avro type {schema!r}")
    if isinstance(schema, list):
        if len(schema) == 2 and "null" in schema:
            null_idx = schema.index("null")
            inner = _make_writer(schema[1 - null_idx])
            def wu(v):
                if v is None:
                    return _zz(null_idx)
                return _zz(1 - null_idx) + inner(v)
            return wu
        raise ValueError(f"unsupported union {schema!r}")
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt == "decimal" and t in ("bytes", "fixed"):
        scale = int(schema.get("scale", 0))
        size = int(schema["size"]) if t == "fixed" else None

        def wdec(v):
            import decimal as _dec

            unscaled = int(
                (_dec.Decimal(v).scaleb(scale)).to_integral_value()
            )
            n = size or max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(n, "big", signed=True)
            return raw if size else _enc_len_bytes(raw)

        return wdec
    if lt == "date" and t == "int":
        return lambda v: _zz((v - _EPOCH).days)
    if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
        div = 1_000 if lt == "timestamp-millis" else 1
        def wts(v):
            us = (v - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
                microseconds=1
            )
            return _zz(us // div)
        return wts
    if t == "record":
        ws = [(f["name"], _make_writer(f["type"])) for f in schema["fields"]]
        return lambda v: b"".join(w(v[n]) for n, w in ws)
    if t == "enum":
        idx = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda v: _zz(idx[v])
    if t == "fixed":
        size = int(schema["size"])
        def wfix(v):
            raw = bytes(v)
            if len(raw) != size:
                raise ValueError(f"fixed size {len(raw)} != {size}")
            return raw
        return wfix
    if t == "array":
        iw = _make_writer(schema["items"])
        def wa(v):
            if not v:
                return _zz(0)
            return _zz(len(v)) + b"".join(iw(x) for x in v) + _zz(0)
        return wa
    if t == "map":
        vw = _make_writer(schema["values"])
        def wm(v):
            if not v:
                return _zz(0)
            body = b"".join(
                _enc_len_bytes(k.encode("utf-8")) + vw(x)
                for k, x in sorted(v.items())
            )
            return _zz(len(v)) + body + _zz(0)
        return wm
    return _make_writer(t)


def write_avro(
    rows: list,
    schema: "dict | str",
    path: str,
    codec: str = "null",
    rows_per_block: int = 1000,
    sync: "bytes | None" = None,
    extra_meta: "dict[str, bytes] | None" = None,
) -> int:
    """Write an Avro Object Container file (deterministic: the sync
    marker derives from the path unless given). ``extra_meta`` adds
    application key-value pairs to the container header (Iceberg
    manifests REQUIRE schema/partition-spec/format-version/content
    keys there — sources/iceberg_interop.py). Returns bytes written."""
    import hashlib

    if isinstance(schema, str):
        schema = json.loads(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    w = _make_writer(schema)
    if sync is None:
        sync = hashlib.md5(path.encode()).digest()
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    buf.write(_zz(len(meta)))
    for k in sorted(meta):
        buf.write(_enc_len_bytes(k.encode()))
        buf.write(_enc_len_bytes(meta[k]))
    buf.write(_zz(0))
    buf.write(sync)
    for lo in range(0, len(rows), rows_per_block):
        chunk = rows[lo : lo + rows_per_block]
        body = b"".join(w(r) for r in chunk)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = comp.compress(body) + comp.flush()
        buf.write(_zz(len(chunk)))
        buf.write(_zz(len(body)))
        buf.write(body)
        buf.write(sync)
    out = buf.getvalue()
    with open(path, "wb") as fh:
        fh.write(out)
    return len(out)


# ---------------------------------------------------------------------------
# distributed egress under a TARGET writer schema (r10) — the write
# twin of the reader-side resolution: a frame still shaped like an OLD
# schema version lands as containers valid under the EVOLVED schema.
# ---------------------------------------------------------------------------

# lossless Spark-type widenings the spec's promotion table permits in
# the write direction (narrowing always refuses)
_WIDEN_OK = {
    (T.ByteType(), T.ShortType()), (T.ByteType(), T.IntegerType()),
    (T.ByteType(), T.LongType()), (T.ShortType(), T.IntegerType()),
    (T.ShortType(), T.LongType()), (T.IntegerType(), T.LongType()),
    (T.IntegerType(), T.FloatType()), (T.IntegerType(), T.DoubleType()),
    (T.LongType(), T.FloatType()), (T.LongType(), T.DoubleType()),
    (T.FloatType(), T.DoubleType()),
    (T.StringType(), T.BinaryType()), (T.BinaryType(), T.StringType()),
}


def _writer_resolution(df_schema: T.StructType, target: dict):
    """Resolve a frame's columns to a TARGET Avro record schema —
    the spec's resolution rules mirrored into the write direction:
    target fields match a column by name or by one of the FIELD's
    aliases; a target field with no column fills from its declared
    default (no default -> refuse); lossless numeric/string-bytes
    promotions cast in the projection; narrowing refuses; a frame
    column consumed by no target field refuses (dropping data on
    egress is never silent). Returns (select_exprs, fills) where
    ``fills`` maps absent field names to their python default
    values."""
    from pyspark.sql import functions as F

    if target.get("type") != "record":
        raise ValueError("target schema must be a record")
    by_name = {f.name: f for f in df_schema.fields}
    exprs, fills, consumed = [], {}, set()
    for fld in target["fields"]:
        src = None
        if fld["name"] in by_name:
            src = fld["name"]
        else:
            for a in fld.get("aliases") or ():
                if a in by_name:
                    src = a
                    break
        ftype = fld["type"]
        want, _r = _make_reader(ftype)
        if src is None:
            if "default" not in fld:
                raise ValueError(
                    f"target field {fld['name']!r} has no source "
                    "column and no default"
                )
            fills[fld["name"]] = _default_value(ftype, fld["default"])
            continue
        consumed.add(src)
        have = by_name[src].dataType
        if have == want:
            exprs.append(F.col(src).alias(fld["name"]))
        elif (have, want) in _WIDEN_OK:
            exprs.append(F.col(src).cast(want).alias(fld["name"]))
        else:
            raise ValueError(
                f"column {src!r} ({have.simpleString()}) does not "
                f"losslessly widen to target field {fld['name']!r} "
                f"({want.simpleString()})"
            )
    extra = [f.name for f in df_schema.fields if f.name not in consumed]
    if extra:
        raise ValueError(
            f"columns {extra} match no target field; dropping data "
            "on egress must be explicit (select them away first)"
        )
    return exprs, fills


def _py_cell(v, ftype):
    """One pandas cell -> the python value the encoder expects (nulls
    normalized, numpy unwrapped, float-backed nullable ints restored,
    pandas timestamps to datetime/date)."""
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return None
    base = ftype
    if isinstance(base, list):  # nullable union: resolve on the value
        base = base[1] if base[0] == "null" else base[0]
    t = base if isinstance(base, str) else base.get("type")
    lt = None if isinstance(base, str) else base.get("logicalType")
    if lt == "date":
        if isinstance(v, (pd.Timestamp, datetime.datetime)):
            return v.date()
        return v
    if lt in ("timestamp-millis", "timestamp-micros"):
        return v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
    if lt == "decimal":
        return v  # the encoder consumes the Decimal directly
    if t in ("int", "long"):
        return int(v)
    if t in ("float", "double"):
        return float(v)
    if t == "boolean":
        return bool(v)
    if t == "string":
        return str(v)
    if t == "bytes":
        return bytes(v)
    return v


def avro_write(
    df: DataFrame,
    path: str,
    schema_json: str,
    codec: str = "null",
    rows_per_block: int = 1000,
) -> int:
    """Distributed Avro egress: ONE container file per non-empty
    partition, written executor-side (Arrow ``mapInPandas`` — the
    write mirror of read_avro's file-parallel scan), every file valid
    under the TARGET ``schema_json`` via :func:`_writer_resolution`
    (alias matching, default fill, lossless promotions; anything else
    refuses before a byte lands). Returns the row count written; the
    target directory must not already hold .avro files (a silent
    append would duplicate rows on retry).

    Scale: the frame never collects — each task encodes its own
    partition; at 100 TB the write is as parallel as the upstream
    plan, and downstream consumers on the EVOLVED schema read every
    container uniformly (no reader-side resolution needed for the
    files this writes)."""
    import uuid

    import pandas as pd

    target = json.loads(schema_json) if isinstance(
        schema_json, str
    ) else schema_json
    exprs, fills = _writer_resolution(df.schema, target)
    os.makedirs(path, exist_ok=True)
    if any(f.endswith(".avro") for f in os.listdir(path)):
        raise FileExistsError(f"{path} already holds .avro files")
    tschema = json.dumps(target, sort_keys=True)
    ftypes = {f["name"]: f["type"] for f in target["fields"]}
    present = [
        f["name"] for f in target["fields"] if f["name"] not in fills
    ]

    def egress(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        rows = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                r = {
                    n: _py_cell(rec[n], ftypes[n]) for n in present
                }
                r.update(fills)
                rows.append(r)
        if rows:
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
            write_avro(
                rows, tschema, fname, codec=codec,
                rows_per_block=rows_per_block,
            )
            yield pd.DataFrame({"file": [fname], "n_rows": [len(rows)]})
        else:
            yield pd.DataFrame({
                "file": pd.Series([], dtype=str),
                "n_rows": pd.Series([], dtype="int64"),
            })

    out = df.select(*exprs).mapInPandas(egress, "file string, n_rows long")
    return sum(r["n_rows"] for r in out.collect())
