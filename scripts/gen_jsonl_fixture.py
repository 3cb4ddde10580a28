#!/usr/bin/env python
"""Generate the committed JSONL quarantine fixture
(fixtures/jsonl_shard.jsonl) — a deterministic shard with planted
corrupt lines, used by the `jsonl_quarantine` registry query.

The fixture is COMMITTED (not generated at query time) so the Spark
query and the DuckDB oracle read the exact same bytes. Re-running this
script reproduces the file byte-for-byte (pure function of the loop
index; no RNG, no timestamps).

Layout: 120 lines. Every 7th line starting at 3 is corrupt, cycling
through the four corruption shapes web-scale JSONL actually shows:
truncated object (writer died mid-record), non-JSON garbage (log line
interleaved into the shard), empty line, and a syntactically invalid
value. Everything else is a clean object, with one clean line carrying
an extra unknown field (PERMISSIVE must keep it clean) and escaped
quotes/newlines inside text values (must survive the line framing).
"""

from __future__ import annotations

import json
import os

LANGS = ["en", "de", "fr", "es", "zh"]


def lines() -> list[str]:
    out: list[str] = []
    for i in range(120):
        if i % 7 == 3:
            kind = (i // 7) % 4
            if kind == 0:
                out.append('{"doc_id": %d, "lang": "en", "text": "truncated' % i)
            elif kind == 1:
                out.append("garbage line %d not json at all" % i)
            elif kind == 2:
                out.append("")
            else:
                out.append('{"doc_id": , "lang": "en"}')
            continue
        rec = {
            "doc_id": i,
            "lang": LANGS[i % len(LANGS)],
            "text": 'doc %d says "hi"\nand spans lines \\ twice' % i,
        }
        if i == 11:
            rec["extra_field"] = "ignored-by-schema"
        out.append(json.dumps(rec, ensure_ascii=True, sort_keys=True))
    return out


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "fixtures", "jsonl_shard.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="ascii", newline="\n") as f:
        f.write("\n".join(lines()) + "\n")
    print(f"wrote {path}: {len(lines())} lines")


if __name__ == "__main__":
    main()
