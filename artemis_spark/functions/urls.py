"""URL canonicalization, resolution, classification and keying — all
native column expressions (whole-stage codegen; zero Python per row).

Reference semantics being reproduced:
  * canonical form  — urlparse components cached on the Task
    (/root/reference/src/Task.py:68-75) and the extractor's rebuild
    "scheme://netloc/path?query" that drops fragment and params
    (/root/reference/src/extractors/ExtractorFactory.py:50-66).
  * relative-link resolution — lxml ``make_links_absolute`` in
    /root/reference/src/extractors/ExtractorFactory.py:84-86; here a
    native ``when`` chain over the child-URL shape.
  * nature classification — ``Task.buildFromURI``
    (/root/reference/src/Task.py:30-42): ``.onion`` host -> tor,
    ``magnet:`` prefix -> torrent, else static.
  * host-major keying — ``Phi = md5(netloc)*2^128 + md5(url)``
    (/root/reference/src/Netarea.py:7-11).  The point of Phi's high bits
    is that one host lands in one shard; ``xxhash64(host)`` gives Spark's
    hash partitioner the same colocation without 256-bit arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme per RFC 3986: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*):"

# one pass over "scheme://netloc path [?query]"; fragment handled by the
# trailing .*.  Pure regex instead of parse_url/java.net.URI: URI
# construction (plus exception fill-in on malformed input) costs ~10x a
# regex match, and the crawl canonicalizes millions of outlinks per
# round.  Netloc semantics ([^/?#]+) exactly match the pure-Python
# fixture model in model.py.
_URL_PAT = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?.*$"


def scheme_of(url: Column) -> Column:
    """Lowercased scheme, or NULL if the URL has none (relative)."""
    s = F.regexp_extract(url, _SCHEME_RE, 1)
    return F.when(s != "", F.lower(s))


def host_of(url: Column) -> Column:
    """Lowercased netloc or NULL on malformed input."""
    h = F.regexp_extract(url, _URL_PAT, 2)
    return F.when(h != "", F.lower(h))


def path_of(url: Column) -> Column:
    """Path with ``;params`` and fragment dropped; '' -> '/'."""
    p = F.regexp_extract(url, _URL_PAT, 3)
    p = F.regexp_replace(p, ";.*$", "")  # drop params (src/Task.py:72 unused downstream)
    return F.when(p == "", F.lit("/")).otherwise(p)


def query_of(url: Column) -> Column:
    q = F.regexp_extract(url, _URL_PAT, 4)
    return F.when(q != "", q)


# detects any '.' or '..' path segment; kept identical to the gate in
# model._remove_dot_segments so engine and fixture model collapse the
# exact same inputs
_DOT_SEG_RE = r"/\.\.?(/|$)"


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 dot-segment removal over an absolute path.

    The reference gets this from lxml ``make_links_absolute`` (urljoin,
    /root/reference/src/extractors/ExtractorFactory.py:84-86): without
    it ``/a/b/../c`` and ``/a/c`` are distinct url_seen keys and every
    ``../``-relative link on a real web double-fetches.

    Shape: the overwhelmingly common dot-free path takes only the
    ``rlike`` gate (whole-stage codegen); rows that do contain a dot
    segment pay one JVM-side higher-order fold over the split segments
    (exact to any nesting depth — no bounded-iteration regex loop).
    Trailing ``/.`` and ``/..`` are first rewritten to their
    slash-terminated forms so the fold needs no last-segment special
    case; empty segments (``//``) are preserved exactly as urljoin does.
    """
    pre = F.regexp_replace(path, r"/\.$", "/")
    pre = F.regexp_replace(pre, r"/\.\.$", "/../")
    segs = F.slice(F.split(pre, "/"), 2, 2_000_000_000)  # drop leading ''
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..", F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    collapsed = F.concat(F.lit("/"), F.array_join(folded, "/"))
    return F.when(path.rlike(_DOT_SEG_RE), collapsed).otherwise(path)


def canonicalize(url: Column) -> Column:
    """Canonical crawl-equivalence key: ``scheme://host/path[?query]``.

    NULL for URLs with no scheme or no host (the extractor's guard at
    /root/reference/src/extractors/ExtractorFactory.py:56-60 fills these
    from the parent; use :func:`resolve_url` first for outlinks).
    Lowercases scheme+host, keeps path case, drops fragment and params,
    normalizes empty path to '/', collapses ``.``/``..`` path segments
    (RFC 3986 §5.2.4 — lxml ``make_links_absolute`` semantics, so both
    dot-relative outlinks and absolute URLs with dot segments land on
    one crawl-equivalence key).
    """
    u = F.trim(url)
    sch = scheme_of(u)
    hst = host_of(u)
    q = query_of(u)
    rebuilt = F.concat(
        sch,
        F.lit("://"),
        hst,
        remove_dot_segments(path_of(u)),
        F.when(q.isNotNull() & (q != ""), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    # inner whitespace is always invalid (the rule is explicit so the
    # pure-Python fixture model stays exact)
    return F.when(
        ~u.rlike(r"\s") & sch.isNotNull() & hst.isNotNull() & (hst != ""), rebuilt
    )


def resolve_url(parent: Column, child: Column) -> Column:
    """Resolve a possibly-relative outlink against its page URL.

    Handles: absolute (own scheme), protocol-relative (``//h/p``),
    root-relative (``/p``), and sibling-relative (``p``) forms — the
    shapes the synthetic web emits.  ``./``/``../`` segments in the
    merged path are collapsed by :func:`canonicalize` (RFC 3986
    §5.2.4), matching lxml ``make_links_absolute``.
    Returns the *un-canonicalized* absolute URL; feed to canonicalize().
    """
    c = F.trim(child)
    p = F.trim(parent)
    p_scheme = scheme_of(p)
    p_host = host_of(p)
    # parent directory: path up to and including the last '/'
    p_dir = F.regexp_replace(path_of(p), "[^/]*$", "")
    return (
        F.when(c.isNull() | (c == ""), F.lit(None))
        .when(c.rlike(_SCHEME_RE), c)
        .when(c.startswith("//"), F.concat(p_scheme, F.lit(":"), c))
        .when(c.startswith("/"), F.concat(p_scheme, F.lit("://"), p_host, c))
        .otherwise(F.concat(p_scheme, F.lit("://"), p_host, p_dir, c))
    )


def classify_nature(url: Column) -> Column:
    """TaskNature from the URL shape (/root/reference/src/Task.py:30-42)."""
    return (
        F.when(F.lower(url).startswith("magnet:"), F.lit("web_static_torrent"))
        .when(host_of(url).endswith(".onion"), F.lit("web_static_tor"))
        .when(F.lower(url).endswith("sitemap.xml"), F.lit("web_static_sitemap"))
        .otherwise(F.lit("web_static"))
    )


def host_partition_key(host: Column, num_partitions: int) -> Column:
    """Deterministic shard id for a host — the netarea analogue.

    ``pmod(xxhash64(host), P)`` colocates all URLs of a host in one
    partition exactly as Phi's md5(netloc) high bits do
    (/root/reference/src/Netarea.py:7-11).
    """
    return F.pmod(F.xxhash64(host), F.lit(num_partitions)).cast("int")


def salted_host(host: Column, url: Column, salt: int) -> Column:
    """Skew-salted repartition key for the fetch wave (north_rule).

    Hot hosts (the netarea-overload-split analogue,
    /root/reference/src/network/Reports.py:86-91) get spread over
    ``salt`` subpartitions while staying deterministic per URL.
    """
    return F.concat_ws("#", host, F.pmod(F.xxhash64(url), F.lit(salt)).cast("string"))


def parse_magnet(uri: Column) -> Column:
    """Magnet-URI grammar — the S6 torrent identity slice.

    The reference types any ``magnet:`` URL as a torrent task
    (/root/reference/src/Task.py:35-37) and regenerates magnet URIs from
    fetched .torrent metadata via ``lt.make_magnet_uri``
    (/root/reference/src/Task.py:47-59); the transmission-rpc transfer
    itself (/root/reference/src/Slave.py:383-474) needs a daemon socket
    and stays stubbed in-sandbox (sources/torrents.py).  This parses the
    identity fields the dataflow needs — all native expressions:

      info_hash     xt=urn:btih:<40-hex | 32-base32>, lowercased — THE
                    dedup key (two magnets with one info_hash are the
                    same torrent regardless of dn/tr decoration)
      display_name  dn= param, NULL when absent
      trackers      every tr= param, in order (possibly empty array)
    """
    xt = F.regexp_extract(uri, r"[?&]xt=urn:btih:([A-Fa-f0-9]{40}|[A-Za-z2-7]{32})", 1)
    return F.struct(
        F.nullif(F.lower(xt), F.lit("")).alias("info_hash"),
        F.nullif(F.regexp_extract(uri, r"[?&]dn=([^&]*)", 1), F.lit("")).alias(
            "display_name"
        ),
        F.regexp_extract_all(uri, F.lit(r"[?&]tr=([^&]*)"), F.lit(1)).alias("trackers"),
    )


def onion_version(host: Column) -> Column:
    """Onion-service address version — the S4 tor validity slice.

    The reference types tor tasks by bare suffix test
    (``netloc[-6:] == ".onion"``, /root/reference/src/Task.py:33-34) and
    hands them to a SOCKS5 fetch (HTTPDefaultHandler.py:66-89, no
    egress in-sandbox).  Versioning validates what the suffix test
    accepts blindly: 3 for a v3 address (56 base32 chars), 2 for the
    retired v2 format (16), NULL for anything else — the routing filter
    can then drop malformed .onion hosts instead of queueing dead
    fetches.
    """
    return (
        F.when(host.rlike(r"^[a-z2-7]{56}\.onion$"), F.lit(3))
        .when(host.rlike(r"^[a-z2-7]{16}\.onion$"), F.lit(2))
        .cast("int")
    )
