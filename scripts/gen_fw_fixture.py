#!/usr/bin/env python
"""Generate the committed fixed-width fixture
(fixtures/fixedwidth_shard.txt) for the `fw_ingest` registry query.

Committed (not generated at query time) so the Spark query and the
DuckDB oracle read the exact same bytes; re-running reproduces the
file byte-for-byte (pure function of the loop index — no RNG, no
timestamps).

Layout (width 28): doc_id cols 1-6 (right-aligned, space-padded
bigint), lang cols 7-8, score cols 9-12 (right-aligned bigint), name
cols 13-28 (left-aligned, space-padded string). 110 lines; every 9th
line starting at 4 is corrupt, cycling through the three malformations
fixed-width feeds actually show: a short (truncated) line, letters in
a numeric field, and an overlong line (a field overflowed its column
budget and shifted the record).
"""

from __future__ import annotations

import os

LANGS = ["en", "de", "fr", "es", "zh"]


def line_for(i: int) -> str:
    if i % 9 == 4:
        shape = (i // 9) % 3
        if shape == 0:
            return f"{i:>6}en"  # truncated record
        if shape == 1:
            return f"{i:>6}de12ab{'name' + str(i):<16}"  # letters in score
        return f"{i:>6}fr{i % 10000:>4}{'averylongname' + str(i):<20}"  # overlong
    lang = LANGS[i % len(LANGS)]
    return f"{i:>6}{lang}{(i * 7) % 10000:>4}{'item ' + str(i):<16}"


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "fixtures", "fixedwidth_shard.txt")
    with open(out, "w") as fh:
        for i in range(110):
            fh.write(line_for(i) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
