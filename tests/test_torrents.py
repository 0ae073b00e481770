"""S6/S4 grammar slices: magnet-URI parsing + onion-address validation
(reference Task.py:33-38 nature tests, Task.py:47-59 make_magnet_uri,
Slave.py:383-474 transfer thread — transfer itself stubbed, no daemon)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from artemis_spark.functions.urls import (  # noqa: E402
    classify_nature,
    onion_version,
    parse_magnet,
)
from artemis_spark.sources.torrents import torrent_fetch_stub  # noqa: E402

HEX40 = "a" * 20 + "0123456789abcdef0123"
B32 = "abcdefghijklmnop"  # 16 valid base32 chars


def _parse(spark, uris):
    df = spark.createDataFrame([(u,) for u in uris], ["uri"])
    return [
        r["m"].asDict()
        for r in df.select(parse_magnet(F.col("uri")).alias("m")).collect()
    ]


def test_magnet_full(spark):
    [m] = _parse(
        spark,
        [
            f"magnet:?xt=urn:btih:{HEX40}&dn=My+Doc&tr=http%3A%2F%2Ft1%2Fa"
            "&tr=udp%3A%2F%2Ft2%3A80"
        ],
    )
    assert m["info_hash"] == HEX40
    assert m["display_name"] == "My+Doc"
    assert m["trackers"] == ["http%3A%2F%2Ft1%2Fa", "udp%3A%2F%2Ft2%3A80"]


def test_magnet_hash_normalized_and_base32(spark):
    up, b32 = _parse(
        spark,
        [
            f"magnet:?xt=urn:btih:{HEX40.upper()}&dn=x",
            f"magnet:?dn=y&xt=urn:btih:{B32.upper()}{B32.upper()}",  # 32 b32, xt not first
        ],
    )
    assert up["info_hash"] == HEX40  # lowercased -> dedup key is canonical
    assert b32["info_hash"] == (B32 + B32).lower()


def test_magnet_missing_fields(spark):
    bad, bare = _parse(
        spark,
        [
            "magnet:?xt=urn:btih:tooshort",  # malformed hash
            f"magnet:?xt=urn:btih:{HEX40}",  # no dn, no trackers
        ],
    )
    assert bad["info_hash"] is None
    assert bare["display_name"] is None and bare["trackers"] == []


def test_magnet_nature_and_onion_nature(spark):
    df = spark.createDataFrame(
        [(f"magnet:?xt=urn:btih:{HEX40}",), (f"http://{B32}.onion/x",),
         ("http://host0.test/a",)],
        ["url"],
    )
    out = [r[0] for r in df.select(classify_nature(F.col("url"))).collect()]
    assert out == ["web_static_torrent", "web_static_tor", "web_static"]


def test_onion_versions(spark):
    cases = [
        (B32 * 3 + "abcdefgh", 3),  # 56 chars -> v3
        (B32, 2),                   # 16 chars -> v2
        (B32 + "abcd", None),       # 20 chars -> invalid
        ("host0.test", None),       # not onion
        ("UPPER" + B32[5:], None),  # uppercase not in the onion alphabet
    ]
    df = spark.createDataFrame(
        [(h + (".onion" if i < 3 or i == 4 else ""),) for i, (h, _) in enumerate(cases)],
        ["host"],
    )
    got = [r[0] for r in df.select(onion_version(F.col("host"))).collect()]
    assert got == [v for _, v in cases]


def test_transfer_stub_pins_signature(spark):
    wave = spark.createDataFrame([(f"magnet:?xt=urn:btih:{HEX40}",)], ["url"])
    with pytest.raises(NotImplementedError):
        torrent_fetch_stub(wave)
