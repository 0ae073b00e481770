"""Real markup extraction (T2/T3) — native column expressions.

Reference semantics being reproduced:
  * HTML link extraction — lxml ``document_fromstring`` +
    ``make_links_absolute(base, resolve_base_href=True)`` + ``iterlinks``
    (/root/reference/src/extractors/ExtractorFactory.py:77-91).  lxml
    iterlinks yields href/src/action attributes; resolve_base_href uses a
    ``<base href>`` tag as the resolution parent and removes it from the
    document.  Here: regexp pulls every href/src attribute (both quote
    styles) after <base> tags are stripped, the base href is surfaced as a
    separate column, and HTML entities are unescaped.  Link ABSOLUTIZATION
    is deliberately left to the caller (``resolve_url(parent, raw)`` with
    parent = coalesce(base, page_url)) so the crawl keeps its staged
    regex projections (plans/crawl.py codegen note).
  * Sitemap/XML ``//loc`` extraction — XPath local-name()='loc' text
    (/root/reference/src/extractors/ExtractorFactory.py:26-68); here a
    namespace-prefix-tolerant <loc> regexp + XML entity unescape.

lxml is not available in this container, so the parser is a regexp
grammar over well-formed-ish markup — every expression is JVM-side
whole-stage-codegen (no Python, no Arrow hop), which is also the right
100 TB shape: link extraction runs on every fetched page, and a pandas
UDF here would put the single hottest per-byte loop of the crawl on the
slow path.  The rendering helpers below are the exact inverse used by
the synthetic-web generator and the golden tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# href/src/action attributes, the lxml iterlinks surface we support.
# Two patterns because capture groups cannot span the quote alternation
# in a form both Java regex and RE2 (DuckDB oracle) execute identically.
HREF_DQ_RE = r"""(?i)\b(?:href|src|action)\s*=\s*"([^"]*)\""""
HREF_SQ_RE = r"""(?i)\b(?:href|src|action)\s*=\s*'([^']*)'"""
BASE_TAG_RE = r"(?i)<base\b[^>]*>"
BASE_HREF_RE = r"""(?i)<base\b[^>]*\bhref\s*=\s*["']([^"']*)["']"""
# namespace-prefix tolerant <loc>, text child only (reference XPath
# //*[local-name()='loc']/text()[1])
LOC_RE = r"(?is)<(?:\w+:)?loc\b[^>]*>\s*([^<]*?)\s*</(?:\w+:)?loc\s*>"

# (entity, char) in APPLY order for unescaping: &amp; must come last so
# double-escaped text is not double-unescaped.
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def unescape_entities(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def escape_markup(s: str) -> str:
    """Python-side inverse of unescape_entities, for rendering/tests."""
    s = s.replace("&", "&amp;")
    for ent, ch in _ENTITIES[:-1]:
        s = s.replace(ch, ent)
    return s


def html_links(body: Column) -> Column:
    """array<string> of raw (unresolved) href/src/action values, entity-
    unescaped, base tags excluded (resolve_base_href removes them)."""
    stripped = F.regexp_replace(body, BASE_TAG_RE, "")
    links = F.concat(
        F.regexp_extract_all(stripped, F.lit(HREF_DQ_RE), 1),
        F.regexp_extract_all(stripped, F.lit(HREF_SQ_RE), 1),
    )
    return F.transform(links, unescape_entities)


def html_base(body: Column) -> Column:
    """The <base href> value (entity-unescaped) or NULL — the resolution
    parent override of resolve_base_href (ExtractorFactory.py:84-86)."""
    b = F.regexp_extract(body, BASE_HREF_RE, 1)
    return F.when(b != "", unescape_entities(b))


def sitemap_locs(body: Column) -> Column:
    """array<string> of <loc> text children, XML-entity-unescaped
    (ExtractorFactory.py:26-68; relative-URL renormalization happens in
    the caller's resolve_url+canonicalize, matching :50-66)."""
    return F.transform(
        F.regexp_extract_all(body, F.lit(LOC_RE), 1), unescape_entities
    )


EXTRACT_RESULT_TYPE = T.StructType(
    [
        T.StructField("base", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def extract_outlinks(body_bytes: Column, nature: Column) -> Column:
    """Extractor dispatch (T1, ExtractorFactory.py:8-16): sitemap nature
    -> <loc> grammar, else HTML href/src grammar.  Returns
    struct(base string, links array<string>); NULL body -> NULL."""
    body = body_bytes.cast("string")  # binary -> UTF-8
    is_sitemap = nature == F.lit("web_static_sitemap")
    return F.when(
        body.isNotNull(),
        F.struct(
            F.when(~is_sitemap, html_base(body)).alias("base"),
            F.when(is_sitemap, sitemap_locs(body))
            .otherwise(html_links(body))
            .alias("links"),
        ),
    )


# ---------------------------------------------------------------------------
# rendering — the inverse grammar, used by datagen + golden tests
# ---------------------------------------------------------------------------


def render_page_html(url: str, links: list[str]) -> bytes:
    """Deterministic page body whose extraction yields exactly ``links``.

    Alternates <a href>/<img src> so both attribute kinds are exercised;
    the <base href> equals the page URL (a no-op for resolution, but the
    resolve_base_href path runs on every page)."""
    parts = [
        '<html><head><base href="',
        escape_markup(url),
        '"><title>',
        escape_markup(url),
        "</title></head><body>",
    ]
    for i, link in enumerate(links):
        esc = escape_markup(link)
        if i % 3 == 2:
            parts.append(f'<img src="{esc}">')
        else:
            parts.append(f'<a href="{esc}">l{i}</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def render_sitemap_xml(locs: list[str]) -> bytes:
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u in locs:
        parts.append(f"<url><loc>{escape_markup(u)}</loc></url>")
    parts.append("</urlset>")
    return "".join(parts).encode("utf-8")
