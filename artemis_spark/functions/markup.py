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

# --- login-form grammar (reference FormHandler/SigInForm) -------------------
# Form blocks, their action/method attributes, and their <input> tags.
# Same two-pattern quote handling as HREF_*_RE so the DuckDB (RE2) oracle
# executes the identical grammar.
FORM_BLOCK_RE = r"(?is)<form\b[^>]*>.*?</form\s*>"
ACTION_DQ_RE = r"""(?i)\baction\s*=\s*"([^"]*)\""""
ACTION_SQ_RE = r"""(?i)\baction\s*=\s*'([^']*)'"""
METHOD_DQ_RE = r"""(?i)\bmethod\s*=\s*"([^"]*)\""""
METHOD_SQ_RE = r"""(?i)\bmethod\s*=\s*'([^']*)'"""
INPUT_TAG_RE = r"(?i)<input\b[^>]*>"
NAME_DQ_RE = r"""(?i)\bname\s*=\s*"([^"]*)\""""
NAME_SQ_RE = r"""(?i)\bname\s*=\s*'([^']*)'"""
TYPE_DQ_RE = r"""(?i)\btype\s*=\s*"([^"]*)\""""
TYPE_SQ_RE = r"""(?i)\btype\s*=\s*'([^']*)'"""

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


# ---------------------------------------------------------------------------
# login-form parsing (reference FormHandler.extractOne + SigInForm,
# /root/reference/src/accreditation/FormHandler.py:9-36, Form.py:36-84)
# ---------------------------------------------------------------------------


def _first_attr(tag: Column, dq_re: str, sq_re: str) -> Column:
    """First attribute value in either quote style; absent/empty -> NULL
    (lxml attrib semantics: '' is falsy in the reference's `action or
    base_url` fallback, so '' and absent collapse)."""
    d = F.regexp_extract(tag, dq_re, 1)
    s = F.regexp_extract(tag, sq_re, 1)
    return unescape_entities(F.when(d != "", d).when(s != "", s))


def parse_forms(body: Column) -> Column:
    """array<struct<pos,action,method,n_inputs,is_login,user_field,
    pass_field>> — one entry per <form> block, document order.

    Reference semantics reproduced natively (no Python in the loop):
      * form discovery = lxml form elements (FormHandler.extract forms
        loop); classification `is_login` = "has a password-typed input"
        (the formasaurus 'login' class stand-in — formasaurus is a
        trained classifier, but password-input presence is its dominant
        login feature and is deterministic, hence oracle-checkable);
      * ``user_field``/``pass_field`` = SigInForm.pick_fields
        (Form.py:43-57): first input with type='password' names the
        password field; first type='text' the user field, falling back
        to the first type='email' (`userfield or emailfield`); unnamed
        inputs are skipped (x.name is None -> slot stays open);
      * ``method`` = lxml FormElement.method (attribute uppercased,
        default GET); ``action`` = raw attribute, NULL when absent/''
        (fill_form falls back to base_url, Form.py:76-78); inputs
        default to type='text' when the attribute is absent (HTML5 /
        lxml InputElement.type default).
    """
    blocks = F.regexp_extract_all(body, F.lit(FORM_BLOCK_RE), 0)

    def _form(block: Column, i: Column) -> Column:
        open_tag = F.regexp_extract(block, r"(?is)^<form\b[^>]*>", 0)
        inputs = F.transform(
            F.regexp_extract_all(block, F.lit(INPUT_TAG_RE), 0),
            lambda t: F.struct(
                _first_attr(t, NAME_DQ_RE, NAME_SQ_RE).alias("name"),
                F.lower(
                    F.coalesce(
                        _first_attr(t, TYPE_DQ_RE, TYPE_SQ_RE), F.lit("text")
                    )
                ).alias("type"),
            ),
        )

        def _pick(typ: str) -> Column:
            named = F.filter(
                inputs,
                lambda s: (s["type"] == typ) & s["name"].isNotNull(),
            )
            return F.get(named, 0)["name"]

        return F.struct(
            (i + 1).cast("int").alias("pos"),
            _first_attr(open_tag, ACTION_DQ_RE, ACTION_SQ_RE).alias("action"),
            F.upper(
                F.coalesce(
                    _first_attr(open_tag, METHOD_DQ_RE, METHOD_SQ_RE),
                    F.lit("GET"),
                )
            ).alias("method"),
            F.size(inputs).alias("n_inputs"),
            F.exists(inputs, lambda s: s["type"] == "password").alias("is_login"),
            F.coalesce(_pick("text"), _pick("email")).alias("user_field"),
            _pick("password").alias("pass_field"),
        )

    return F.transform(blocks, _form)


def first_login_form(body: Column) -> Column:
    """The first login-classified form of a page, or NULL — the
    FormHandler.extractOne contract (first form whose class matches the
    requested nature, FormHandler.py:36-39)."""
    logins = F.filter(parse_forms(body), lambda f: f["is_login"])
    return F.get(logins, 0)


def render_login_page(
    host: str,
    action: str,
    user_field: str | None,
    pass_field: str | None,
    user_type: str = "text",
    decoy: bool = True,
) -> bytes:
    """Deterministic login page whose parse_forms output is known: an
    optional decoy search form (no password input — must NOT classify
    as login) followed by the login form.  ``pass_field=None`` renders a
    broken form (no password input) for the NoPassField failure path."""
    parts = ["<html><head><title>", escape_markup(host), "</title></head><body>"]
    if decoy:
        parts.append(
            '<form action="/search" method="get">'
            '<input name="q" type="text"><input type="submit"></form>'
        )
    parts.append(f'<form action="{escape_markup(action)}" method="post">')
    if user_field:
        parts.append(f'<input name="{escape_markup(user_field)}" type="{user_type}">')
    if pass_field:
        parts.append(f'<input name="{escape_markup(pass_field)}" type="password">')
    parts.append('<input type="submit" value="go"></form></body></html>')
    return "".join(parts).encode("utf-8")


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
