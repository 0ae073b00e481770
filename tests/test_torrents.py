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


# ---------------------------------------------------------------------------
# .torrent bencode -> magnet (Task.buildFromFile, Task.py:47-59)
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402

from artemis_spark.sources.torrents import (  # noqa: E402
    bencode,
    make_magnet_from_torrent,
    torrents_to_magnets,
)


def _fixture_torrent(name=b"ubuntu.iso", announce=b"http://tr.test/announce",
                     announce_list=None, extra=None):
    info = {b"name": name, b"piece length": 262144,
            b"pieces": b"\x00" * 20, b"length": 12345}
    top = {b"announce": announce, b"info": info}
    if announce_list is not None:
        top[b"announce-list"] = announce_list
    if extra:
        top.update(extra)
    return bencode(top), bencode(info)


def test_make_magnet_golden():
    raw, info_bytes = _fixture_torrent()
    h = hashlib.sha1(info_bytes).hexdigest()
    m = make_magnet_from_torrent(raw)
    assert m == (
        f"magnet:?xt=urn:btih:{h}&dn=ubuntu.iso"
        "&tr=http%3A%2F%2Ftr.test%2Fannounce"
    )


def test_make_magnet_info_hash_is_raw_span_not_reencode():
    """The hash must cover the torrent's EXACT info byte span; a torrent
    with unsorted keys elsewhere must not change it."""
    raw, info_bytes = _fixture_torrent(extra={b"comment": b"hi", b"a": b"z"})
    m = make_magnet_from_torrent(raw)
    assert hashlib.sha1(info_bytes).hexdigest() in m


def test_make_magnet_announce_list_dedup_and_order():
    raw, info_bytes = _fixture_torrent(
        announce=b"http://t1/a",
        announce_list=[[b"http://t1/a", b"http://t2/a"], [b"http://t3/a"]],
    )
    m = make_magnet_from_torrent(raw)
    assert m.count("tr=") == 3  # t1 deduped across announce/announce-list
    assert m.index("t1") < m.index("t2") < m.index("t3")


def test_make_magnet_malformed_returns_none():
    assert make_magnet_from_torrent(b"") is None
    assert make_magnet_from_torrent(b"not bencode") is None
    assert make_magnet_from_torrent(bencode([1, 2, 3])) is None  # not a dict
    assert make_magnet_from_torrent(bencode({b"no": b"info"})) is None
    assert make_magnet_from_torrent(b"d4:infoi5e") is None  # truncated dict


def test_torrents_to_magnets_wave(spark):
    """buildFromFile over a fetch wave: x-bittorrent rows become magnet
    tasks whose info-hash round-trips through parse_magnet; other
    content types and malformed payloads are dropped."""
    raw, info_bytes = _fixture_torrent()
    h = hashlib.sha1(info_bytes).hexdigest()
    rows = [
        ("http://a.test/f.torrent", "application/x-bittorrent", bytearray(raw)),
        ("http://a.test/page.html", "text/html", bytearray(b"<html></html>")),
        ("http://a.test/bad.torrent", "application/x-bittorrent",
         bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "url string, content_type string, body binary")
    out = torrents_to_magnets(df).collect()
    assert len(out) == 1
    assert out[0]["url"] == "http://a.test/f.torrent"
    assert out[0]["info_hash"] == h
    parsed = (
        spark.createDataFrame([(out[0]["magnet"],)], ["uri"])
        .select(parse_magnet(F.col("uri")).alias("m"))
        .collect()[0]["m"]
    )
    assert parsed["info_hash"] == h
    assert parsed["display_name"] == "ubuntu.iso"


# ---------------------------------------------------------------------------
# model mirror vs engine parser: the two bencode implementations (span
# side-table in sources/torrents.py vs (value,start,end) triples in
# model.py) must emit identical magnets on well-formed and reject the
# same malformed inputs — the e2e golden run relies on this agreement.
# ---------------------------------------------------------------------------


def test_model_magnet_mirror_agrees_with_engine_parser():
    from artemis_spark.model import _magnet_from_torrent
    from artemis_spark.sources.torrents import bencode, make_magnet_from_torrent

    cases = [
        {"announce": b"http://tr0.test/announce",
         "info": {"name": b"data-a", "piece length": 16384, "length": 123456,
                  "pieces": b"\x01\x02" * 10}},
        {"announce": b"http://tr0.test/announce",
         "announce-list": [[b"udp://t1.test:80"], [b"http://t2.test/a",
                                                   b"http://tr0.test/announce"]],
         "info": {"name": b"name with spaces & unicode \xc3\xa9".decode("utf-8").encode("utf-8"),
                  "piece length": 32768, "length": 1,
                  "pieces": bytes(range(20))}},
        {"info": {"name": b"", "length": 0, "pieces": b""}},  # empty dn dropped
    ]
    for top in cases:
        raw = bencode(top)
        eng = make_magnet_from_torrent(raw)
        mod = _magnet_from_torrent(raw)
        assert eng is not None and mod is not None
        assert mod[0] == eng
        assert mod[1] == eng.split("btih:", 1)[1].split("&", 1)[0]

    for bad in [b"", b"not bencode", b"d4:spam4:eggse", bencode([1, 2, 3]),
                b"d4:infoi3e"]:  # truncated dict
        assert make_magnet_from_torrent(bad) is None
        assert _magnet_from_torrent(bad) is None
