"""Fixed-width source contract: extraction, the width-correct-but-
non-numeric trap, and quarantine preservation."""

from __future__ import annotations

from spark_cassandra_collabfiltering_spark.sources import fixedwidth_source as fw

FIELDS = [
    fw.FWField("id", 1, 4, "bigint"),
    fw.FWField("tag", 5, 2),
    fw.FWField("val", 7, 3, "bigint"),
]


def _write(tmp_path, lines):
    p = tmp_path / "feed.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_fixed_width_parses_and_trims(spark, tmp_path):
    path = _write(tmp_path, ["   7ab 42", "  19xy100"])
    clean, bad = fw.read_fixed_width(spark, path, FIELDS)
    got = {r.id: (r.tag, r.val) for r in clean.collect()}
    assert got == {7: ("ab", 42), 19: ("xy", 100)}
    assert bad.count() == 0


def test_fixed_width_quarantines_all_three_shapes(spark, tmp_path):
    lines = [
        "   1ab  1",   # clean
        "   2ab",      # truncated
        "   3abx9z",   # width OK but letters in numeric field
        "   4ab  1EXTRA",  # overlong (shifted record)
    ]
    path = _write(tmp_path, lines)
    clean, bad = fw.read_fixed_width(spark, path, FIELDS)
    assert [r.id for r in clean.collect()] == [1]
    raw = {r[fw.CORRUPT_COL] for r in bad.collect()}
    assert raw == {"   2ab", "   3abx9z", "   4ab  1EXTRA"}


def test_record_width(spark):
    assert fw.record_width(FIELDS) == 9
