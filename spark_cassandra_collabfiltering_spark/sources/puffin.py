"""Puffin container + Iceberg v3 deletion-vector blobs, from scratch
(r10) — built from two public Apache Iceberg specifications, with no
Iceberg jar or library:

- The Puffin file format spec (``puffin-spec.md``)::

      Magic  Blob_1 ... Blob_n  Footer
      Footer = Magic, FooterPayload (UTF-8 JSON, optionally
               compressed), FooterPayloadSize (4-byte LE int),
               Flags (4 bytes; byte 0 bit 0 = payload compressed),
               Magic
      Magic  = 0x50 0x46 0x41 0x31  ("PFA1")

  FooterPayload JSON: ``{"blobs": [BlobMetadata...], "properties":
  {...}}``; each BlobMetadata carries ``type``, ``fields``,
  ``snapshot-id``, ``sequence-number``, ``offset``, ``length`` and a
  ``properties`` map.

- The Iceberg v3 table spec's deletion-vectors section: blob type
  ``deletion-vector-v1`` with payload::

      [4-byte BE length of (magic + vector)]
      [4-byte magic 0xD1 0x33 0x39 0x64  (LE 1681511377)]
      [portable 64-bit RoaringBitmap vector]
      [4-byte BE CRC-32 of (magic + vector)]

  and required blob properties ``referenced-data-file`` and
  ``cardinality``. The manifest entry's ``content_offset`` points at
  the length prefix and ``content_size_in_bytes`` spans prefix +
  payload + CRC, so a reader seeks directly without parsing the
  footer.

The DV payload is byte-identical to one entry of Delta's DV sidecar
(the two formats were aligned upstream deliberately), so the roaring
codec is shared with :mod:`.delta_dv` — encoder emits the no-run
cookie, decoder accepts run containers from foreign writers.

Scale posture: DVs are metadata-sized (positions, not rows); blob
reads are a seek + a bounded read, driver- or executor-side.

No reference counterpart (the reference's only file source is the
ratings CSV, CollabFilterCassandraDriver.java:95-96); this is the
storage-interop surface a user migrating from an Iceberg v3 table
needs.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from . import delta_dv as dv

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


def _dv_blob_bytes(positions: "list[int]") -> bytes:
    """One deletion-vector-v1 payload: BE length prefix, then the
    shared (magic + portable-64 roaring) bytes, then BE CRC-32."""
    data = dv.serialize_positions(sorted(set(positions)))
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )


def write_puffin_dvs(
    path: str,
    dvs: "dict[str, list[int]]",
    snapshot_id: int,
    sequence_number: int,
) -> "dict[str, tuple[int, int, int]]":
    """Write ONE Puffin file holding one deletion-vector-v1 blob per
    referenced data file. ``dvs`` maps the referenced data file's
    manifest path string to its deleted row positions. Returns
    ``{referenced: (content_offset, content_size_in_bytes,
    cardinality)}`` — exactly the fields the v3 manifest entry
    records. The footer is written uncompressed (flags 0)."""
    buf = bytearray(MAGIC)
    blobs, out = [], {}
    for ref in sorted(dvs):
        positions = sorted(set(dvs[ref]))
        blob = _dv_blob_bytes(positions)
        off = len(buf)
        buf += blob
        blobs.append({
            "type": DV_BLOB_TYPE,
            "fields": [],
            "snapshot-id": snapshot_id,
            "sequence-number": sequence_number,
            "offset": off,
            "length": len(blob),
            "properties": {
                "referenced-data-file": ref,
                "cardinality": str(len(positions)),
            },
        })
        out[ref] = (off, len(blob), len(positions))
    payload = json.dumps(
        {"blobs": blobs, "properties": {}}, sort_keys=True
    ).encode("utf-8")
    buf += MAGIC
    buf += payload
    buf += struct.pack("<i", len(payload))
    buf += b"\x00\x00\x00\x00"  # flags: footer payload uncompressed
    buf += MAGIC
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(bytes(buf))
    return out


def read_puffin_footer(path: str) -> dict:
    """Parse the footer payload JSON (validates magics; refuses a
    compressed footer — this writer never emits one and no zstd codec
    is assumed present)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob.startswith(MAGIC) or not blob.endswith(MAGIC):
        raise ValueError(f"{path}: not a Puffin file (magic)")
    # from the end: [MAGIC][payload][psize 4 LE][flags 4][MAGIC 4]
    flags = blob[-8:-4]
    (psize,) = struct.unpack("<i", blob[-12:-8])
    if flags[0] & 1:
        raise ValueError(
            f"{path}: compressed Puffin footer payload is not supported"
        )
    if psize < 0 or 16 + psize > len(blob):
        raise ValueError(f"{path}: bad Puffin footer payload size")
    payload = blob[-12 - psize : -12]
    if blob[-16 - psize : -12 - psize] != MAGIC:
        raise ValueError(f"{path}: footer start magic missing")
    return json.loads(payload.decode("utf-8"))


def read_dv_blob(path: str, offset: int, size: int) -> "list[int]":
    """Deleted row positions from one deletion-vector-v1 blob at
    (``offset``, ``size``) — the manifest entry's content_offset /
    content_size_in_bytes. Validates the length prefix, the inner DV
    magic (via the shared codec) and the CRC-32; any mismatch raises
    rather than silently resurrecting or over-deleting rows."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        raw = fh.read(size)
    if len(raw) != size or size < 12:
        raise ValueError(
            f"{path}: truncated DV blob at {offset} (+{size})"
        )
    (ln,) = struct.unpack_from(">i", raw, 0)
    if 4 + ln + 4 != size:
        raise ValueError(
            f"{path}: DV blob length prefix {ln} disagrees with "
            f"content_size_in_bytes {size}"
        )
    data = raw[4 : 4 + ln]
    (crc,) = struct.unpack_from(">I", raw, 4 + ln)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"{path}: DV blob CRC mismatch")
    return dv.deserialize_positions(data)
