"""HTML -> text extraction (operators/text.py html_to_text): the
planted traps every regex stripper must survive — markup inside
script source, entity decode ordering, case-mixed tags — plus the
WARC-chain integration: extracting text from the committed fixture's
response bodies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import text as tx  # noqa: E402
from spark_cassandra_collabfiltering_spark.sources import warc_source as wr  # noqa: E402


def _extract(spark, html: str):
    df = spark.createDataFrame([(1, html)], ["id", "html"])
    return tx.html_to_text(df, "html").collect()[0]


def test_basic_extraction(spark):
    r = _extract(
        spark,
        "<html><head><title> My Page </title></head>"
        "<body><h1>Hello</h1><p>world</p></body></html>",
    )
    assert r.title == "My Page"
    assert r.text == "Hello world"
    assert r.n_links == 0
    assert r.n_tags > 0


def test_script_content_with_markup_does_not_leak(spark):
    r = _extract(
        spark,
        '<body><p>keep</p><script>var s = "<b>LEAK</b>";\n'
        "if (a < b) { f(); }</script><p>also keep</p></body>",
    )
    assert "LEAK" not in r.text
    assert r.text == "keep also keep"


def test_style_and_comments_stripped(spark):
    r = _extract(
        spark,
        "<style>p { color: red; } /* GONE */</style>"
        "<!-- COMMENT\nspanning lines --><p>visible</p>",
    )
    assert "GONE" not in r.text and "COMMENT" not in r.text
    assert r.text == "visible"


def test_entity_decode_order(spark):
    # &amp;lt; must decode ONCE to &lt; (not twice to <)
    r = _extract(spark, "<p>a &amp; b &lt;x&gt; &amp;lt; &quot;q&quot;</p>")
    assert r.text == 'a & b <x> &lt; "q"'


def test_case_insensitive_tags_and_link_count(spark):
    r = _extract(
        spark,
        '<BODY><A href="/a">x</A> <a\nhref="/b">y</a> <abbr>no</abbr></BODY>',
    )
    assert r.n_links == 2  # <abbr> must not count
    assert "x y" in r.text


def test_uppercase_script_stripped(spark):
    r = _extract(spark, "<SCRIPT>var LEAK = 1;</SCRIPT><p>ok</p>")
    assert r.text == "ok"


def test_warc_chain_extracts_fixture_bodies(spark):
    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "sample.warc",
    )
    clean, _ = wr.split_corrupt(wr.read_warc(spark, fixture))
    html = clean.filter(
        (clean.warc_type == "response") & (clean.content_type == "text/html")
    )
    out = {
        r.target_uri: r.text
        for r in tx.html_to_text(html, "body", prefix="").collect()
    }
    assert out["http://example.com/a"] == "hello world from page a"
    assert out["http://example.com/b"] == "recovered after the corrupt record"
