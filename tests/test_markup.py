"""Golden markup-extraction tests (T2/T3), mirroring the reference's
fixture-vs-expected-link-set pattern (/root/reference/tests/ExtractorTest.py:11-72)
with inline fixtures instead of pickled sets.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artemis_spark.functions.markup import (  # noqa: E402
    escape_markup,
    extract_outlinks,
    html_base,
    html_links,
    render_page_html,
    render_sitemap_xml,
    sitemap_locs,
    unescape_entities,
)

HTML_FIXTURE = b"""<html>
<head><BASE HREF="http://base.test/sub/"><title>t &amp; u</title></head>
<body>
<a href="http://abs.test/p1">abs</a>
<a href='/root-rel'>single quotes</a>
<A HREF="sibling.html">case-insensitive tag</A>
<img src="//proto.test/img.png">
<form action="/submit"><input type="text"></form>
<a href="?q=a&amp;b">entity link</a>
<p>href="not-an-attr-context is still matched by the grammar"</p>
<a>no href</a>
</body></html>"""

# lxml iterlinks semantics: href/src/action collected; base tag excluded
HTML_EXPECTED = {
    "http://abs.test/p1",
    "/root-rel",
    "sibling.html",
    "//proto.test/img.png",
    "/submit",
    "?q=a&b",
    'not-an-attr-context is still matched by the grammar',
}

SITEMAP_FIXTURE = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc>http://h.test/page0</loc></url>
 <url><loc>
    http://h.test/page5
 </loc></url>
 <url><sm:loc>http://h.test/ns?a=1&amp;b=2</sm:loc></url>
</urlset>"""

SITEMAP_EXPECTED = {
    "http://h.test/page0",
    "http://h.test/page5",
    "http://h.test/ns?a=1&b=2",
}


def _one(spark, body: bytes, expr):
    df = spark.createDataFrame([(body,)], "body: binary")
    return df.select(expr(F.col("body").cast("string")).alias("v")).first()["v"]


def test_html_links_golden(spark):
    links = _one(spark, HTML_FIXTURE, html_links)
    assert set(links) == HTML_EXPECTED


def test_html_base_golden(spark):
    assert _one(spark, HTML_FIXTURE, html_base) == "http://base.test/sub/"
    assert _one(spark, b"<html><body><a href='/x'>y</a></body></html>", html_base) is None


def test_sitemap_locs_golden(spark):
    locs = _one(spark, SITEMAP_FIXTURE, sitemap_locs)
    assert set(locs) == SITEMAP_EXPECTED
    # reference XPath takes text children only — nested elements yield none
    assert _one(spark, b"<urlset><url><loc><x/></loc></url></urlset>", sitemap_locs) == []


def test_extract_outlinks_dispatch(spark):
    """T1 dispatch (ExtractorFactory.py:8-16): sitemap nature -> loc
    grammar, web_static -> html grammar, NULL body -> NULL."""
    df = spark.createDataFrame(
        [
            (HTML_FIXTURE, "web_static"),
            (SITEMAP_FIXTURE, "web_static_sitemap"),
            (None, "web_static"),
        ],
        "body: binary, nature: string",
    )
    rows = df.select(
        extract_outlinks(F.col("body"), F.col("nature")).alias("ex")
    ).collect()
    assert set(rows[0]["ex"]["links"]) == HTML_EXPECTED
    assert rows[0]["ex"]["base"] == "http://base.test/sub/"
    assert set(rows[1]["ex"]["links"]) == SITEMAP_EXPECTED
    assert rows[1]["ex"]["base"] is None
    assert rows[2]["ex"] is None


def test_garbage_bytes_do_not_crash(spark):
    links = _one(spark, b"\x00\xff\xfe not markup at all < > \x80", html_links)
    assert links == []


@pytest.mark.parametrize(
    "links",
    [
        [],
        ["http://a.test/x", "page3", "//h.test/p", "ht!tp://mal formed", "/q?a=1&b=2"],
        ['with"quote', "with'apostrophe", "with<angle>", "amp&ersand", "pre&amp;escaped"],
    ],
)
def test_render_extract_roundtrip_html(spark, links):
    """render_page_html is the exact grammar inverse of html_links —
    the property the e2e model equality relies on."""
    body = render_page_html("http://h.test/page0", links)
    got = _one(spark, body, html_links)
    assert got == links
    assert _one(spark, body, html_base) == "http://h.test/page0"


def test_render_extract_roundtrip_sitemap(spark):
    locs = ["http://h.test/page0", "/rel?x=1&y=2", "ent&ity"]
    body = render_sitemap_xml(locs)
    assert _one(spark, body, sitemap_locs) == locs


def test_escape_unescape_inverse(spark):
    s = 'a&b<c>d"e\'f&amp;g'
    df = spark.createDataFrame([(escape_markup(s),)], "v: string")
    assert df.select(unescape_entities(F.col("v")).alias("v")).first()["v"] == s


def test_datagen_bodies_match_render_grammar(tiny_web, spark):
    """Vectorized datagen renderer == render_page_html, byte for byte;
    sitemap bodies == render_sitemap_xml."""
    import pyarrow.parquet as pq

    import re

    from artemis_spark.datagen import torrent_bytes

    lg = pq.read_table(f"{tiny_web}/link_graph.parquet").to_pylist()
    assert all(r["body"] is not None for r in lg)
    checked_page = checked_sm = checked_tor = 0
    for r in lg[:50] + lg[-5:]:
        if r["url"].endswith("sitemap.xml"):
            assert bytes(r["body"]) == render_sitemap_xml(r["outlinks"] or [])
            checked_sm += 1
        elif r["url"].endswith(".torrent"):
            g = int(re.search(r"bundle(\d+)\.torrent$", r["url"]).group(1))
            assert bytes(r["body"]) == torrent_bytes(g)
            checked_tor += 1
        else:
            assert bytes(r["body"]) == render_page_html(r["url"], r["outlinks"] or [])
            checked_page += 1
    assert checked_page > 0 and checked_sm > 0 and checked_tor > 0
