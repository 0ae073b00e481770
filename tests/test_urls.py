"""Canonicalizer / resolver / nature-classifier unit-golden tests
(T5/T6; reference semantics ExtractorFactory.py:50-66, Task.py:30-42).
Engine column expressions and the pure-Python model must agree on
every case — the model IS the fixture oracle."""

import pytest
from pyspark.sql import functions as F

from artemis_spark import model as M
from artemis_spark.functions.urls import canonicalize, classify_nature, resolve_url

CANON_CASES = [
    ("http://Host1.TEST/page3", "http://host1.test/page3"),
    ("HTTPS://a.b/P;sid=1?q=2#frag", "https://a.b/P?q=2"),
    ("http://a.b", "http://a.b/"),
    ("http://a.b?x=1", "http://a.b/?x=1"),
    ("  http://a.b/c  ", "http://a.b/c"),
    ("ht!tp://bad", None),
    ("http://a b/c", None),  # inner whitespace
    ("nohost", None),
    ("", None),
    ("magnet:?xt=urn:x", None),  # no netloc
    ("http:///nopath", None),  # empty host
    # RFC 3986 §5.2.4 dot-segment removal (lxml make_links_absolute)
    ("http://a.b/x/./y", "http://a.b/x/y"),
    ("http://a.b/x/../y", "http://a.b/y"),
    ("http://a.b/x/y/..", "http://a.b/x/"),
    ("http://a.b/x/y/../", "http://a.b/x/"),
    ("http://a.b/x/.", "http://a.b/x/"),
    ("http://a.b/../x", "http://a.b/x"),  # above root: .. dropped
    ("http://a.b/../../x", "http://a.b/x"),
    ("http://a.b/a/b/c/../../d", "http://a.b/a/d"),
    ("http://a.b/..", "http://a.b/"),
    ("http://a.b/.", "http://a.b/"),
    ("http://a.b/..x/y", "http://a.b/..x/y"),  # not a dot segment
    ("http://a.b/x../y", "http://a.b/x../y"),
    ("http://a.b//x/../y", "http://a.b//y"),  # empty segs preserved, poppable
    ("http://a.b/x/..?q=1", "http://a.b/?q=1"),  # query survives collapse
]

RESOLVE_CASES = [
    ("http://h.test/dir/page", "sub", "http://h.test/dir/sub"),
    ("http://h.test/dir/page", "/abs", "http://h.test/abs"),
    ("http://h.test/dir/page", "//other.test/x", "http://other.test/x"),
    ("http://h.test/dir/page", "https://e.test/y", "https://e.test/y"),
    ("http://h.test/page", "p2#f", "http://h.test/p2"),
    ("http://h.test/page", "", None),
    # dot-relative outlinks collapse against the parent directory
    ("http://h.test/dir/page", "../up", "http://h.test/up"),
    ("http://h.test/dir/page", "./same", "http://h.test/dir/same"),
    ("http://h.test/a/b/page", "../../root", "http://h.test/root"),
    ("http://h.test/page", "../above", "http://h.test/above"),
    ("http://h.test/dir/page", "sub/../x", "http://h.test/dir/x"),
    ("http://h.test/dir/page", "..", "http://h.test/"),
    ("http://h.test/dir/page", "https://e.test/a/../y", "https://e.test/y"),
]


@pytest.fixture(scope="module")
def run_exprs(spark):
    def f(pairs, expr_builder):
        df = spark.createDataFrame(pairs, "a string, b string")
        return [r["out"] for r in df.select(expr_builder().alias("out")).collect()]

    return f


def test_canonicalize_engine_vs_expected(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "u string")
    got = [r["c"] for r in df.select(canonicalize(F.col("u")).alias("c")).collect()]
    assert got == [exp for _, exp in CANON_CASES]


def test_canonicalize_model_agrees():
    assert [M.canonicalize(u) for u, _ in CANON_CASES] == [e for _, e in CANON_CASES]


def test_resolve_engine(spark):
    df = spark.createDataFrame([(p, c) for p, c, _ in RESOLVE_CASES], "p string, c string")
    got = [
        r["out"]
        for r in df.select(
            canonicalize(resolve_url(F.col("p"), F.col("c"))).alias("out")
        ).collect()
    ]
    assert got == [e for _, _, e in RESOLVE_CASES]


def test_resolve_model_agrees():
    got = [M.canonicalize(M.resolve_url(p, c)) for p, c, _ in RESOLVE_CASES]
    assert got == [e for _, _, e in RESOLVE_CASES]


def test_nature_classify(spark):
    cases = [
        ("magnet:?xt=urn:x", "web_static_torrent"),
        ("http://x.onion/p", "web_static_tor"),
        ("http://h.test/sitemap.xml", "web_static_sitemap"),
        ("http://h.test/p", "web_static"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["n"] for r in df.select(classify_nature(F.col("u")).alias("n")).collect()]
    assert got == [e for _, e in cases]
    assert [M.classify_nature(u) for u, _ in cases] == [e for _, e in cases]
