"""Fuzz equivalence: the Spark column canonicalizer/resolver and the
pure-Python model must agree on arbitrary byte soup, not just the
golden cases — one divergence anywhere breaks the crawl-order fixture.
(One DataFrame pass over a seeded 3000-string corpus, so the fuzz costs
one Spark job, not 3000.)"""

import random
import string

import pytest
from pyspark.sql import functions as F

from artemis_spark import model as M
from artemis_spark.functions.urls import canonicalize, resolve_url

ALPHABET = string.ascii_letters + string.digits + ":/?#;&=%@!~ .-_+[]\\"


def _corpus(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.3:  # plausible URL
            out.append(
                f"{rng.choice(['http', 'HTTPS', 'ftp', 'ht!tp', ''])}://"
                f"{rng.choice(['Host1.test', 'a.b', '', 'h h'])}"
                f"/{''.join(rng.choices(string.ascii_letters + ';?#&=', k=rng.randint(0, 12)))}"
            )
        elif kind < 0.5:  # relative-ish
            out.append("".join(rng.choices(string.ascii_lowercase + "/;#?", k=rng.randint(1, 15))))
        elif kind < 0.7:  # dot-segment soup (RFC 3986 remove_dot_segments)
            segs = rng.choices(
                ["..", ".", "", "a", "b", "..x", "x..", ".y"], k=rng.randint(1, 8)
            )
            base = rng.choice(["http://Dot.test", "http://d.test", ""])
            out.append(base + "/" + "/".join(segs) + rng.choice(["", "/", "/..", "/."]))
        else:  # byte soup
            out.append("".join(rng.choices(ALPHABET, k=rng.randint(0, 30))))
    return out


def test_canonicalize_fuzz_equivalence(spark):
    corpus = _corpus(1234, 3000)
    df = spark.createDataFrame([(u,) for u in corpus], "u string")
    got = [r["c"] for r in df.select(canonicalize(F.col("u")).alias("c")).collect()]
    want = [M.canonicalize(u) for u in corpus]
    bad = [(u, g, w) for u, g, w in zip(corpus, got, want) if g != w]
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"


def test_resolve_fuzz_equivalence(spark):
    parents = ["http://h.test/dir/page", "http://a.b/x", "http://z.test/"]
    children = _corpus(99, 1500)
    pairs = [(parents[i % 3], c) for i, c in enumerate(children)]
    df = spark.createDataFrame(pairs, "p string, c string")
    got = [
        r["o"]
        for r in df.select(
            canonicalize(resolve_url(F.col("p"), F.col("c"))).alias("o")
        ).collect()
    ]
    want = [M.canonicalize(M.resolve_url(p, c)) for p, c in pairs]
    bad = [(pc, g, w) for pc, g, w in zip(pairs, got, want) if g != w]
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"
