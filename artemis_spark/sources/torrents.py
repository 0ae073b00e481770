"""Torrent lifecycle (S6) — grammar implemented, transfer stubbed.

Reference lifecycle (/root/reference/src/Slave.py:383-474): a
TorrentHandler thread feeds magnet tasks to a local transmission-rpc
daemon, polls progress, and on completion walks the downloaded
directory into a resource + child tasks
(/root/reference/src/Slave.py:440-455); fetched ``.torrent`` files are
converted back to magnet tasks via ``lt.make_magnet_uri``
(/root/reference/src/Task.py:47-59).

The dataflow half lives in native columns (functions/urls.py
``parse_magnet``: info-hash identity, display name, tracker list;
``classify_nature`` routes ``magnet:`` to web_static_torrent exactly
like Task.py:35-37).  Info-hash is the dedup key: the url_seen MERGE
on the magnet URI plus a ``parse_magnet(...).info_hash`` grouping
dedupes re-announced torrents across tracker/dn decorations.

The transfer itself needs a transmission daemon socket — absent
in-sandbox, so the fetch below pins the exact batch signature a
cluster deployment swaps in.
"""

from __future__ import annotations

import hashlib
from urllib.parse import quote

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# .torrent -> magnet conversion (reference Task.buildFromFile,
# /root/reference/src/Task.py:47-59: fetched application/x-bittorrent
# payloads become magnet tasks via lt.make_magnet_uri(lt.torrent_info()))
# ---------------------------------------------------------------------------
#
# Pure-Python bencode parser: the info-hash is the SHA1 of the EXACT
# byte span of the top-level ``info`` value, so the parser tracks spans
# instead of re-encoding (re-encoding canonicalizes dict order and would
# hash a different byte string than the one announced in the swarm).


def _bdecode(b: bytes, i: int = 0):
    """Decode one bencoded value at offset ``i``; returns (value, end).
    Raises ValueError on malformed input."""
    c = b[i : i + 1]
    if c == b"i":  # integer: i<digits>e
        e = b.index(b"e", i)
        return int(b[i + 1 : e]), e + 1
    if c == b"l":  # list
        out, i = [], i + 1
        while b[i : i + 1] != b"e":
            v, i = _bdecode(b, i)
            out.append(v)
        return out, i + 1
    if c == b"d":  # dict (keys are byte strings)
        out, i = {}, i + 1
        while b[i : i + 1] != b"e":
            k, i = _bdecode(b, i)
            start = i
            v, i = _bdecode(b, i)
            out[k] = v
            out.setdefault(b"__spans__", {})[k] = (start, i)
        return out, i + 1
    if c.isdigit():  # byte string: <len>:<bytes>
        colon = b.index(b":", i)
        n = int(b[i:colon])
        return b[colon + 1 : colon + 1 + n], colon + 1 + n
    raise ValueError(f"malformed bencode at offset {i}")


def bencode(obj) -> bytes:
    """Inverse grammar, for building test fixtures (sorted dict keys —
    the canonical form real clients emit)."""
    if isinstance(obj, int):
        return b"i%de" % obj
    if isinstance(obj, (bytes, bytearray)):
        return b"%d:%s" % (len(obj), bytes(obj))
    if isinstance(obj, str):
        return bencode(obj.encode("utf-8"))
    if isinstance(obj, list):
        return b"l" + b"".join(bencode(x) for x in obj) + b"e"
    if isinstance(obj, dict):
        items = sorted(
            (k if isinstance(k, bytes) else k.encode("utf-8"), v)
            for k, v in obj.items()
        )
        return b"d" + b"".join(bencode(k) + bencode(v) for k, v in items) + b"e"
    raise TypeError(type(obj))


def make_magnet_from_torrent(b: bytes) -> str | None:
    """lt.make_magnet_uri(lt.torrent_info(bytes)) equivalent: magnet URI
    with the v1 btih info-hash (SHA1 over the raw ``info`` span), the
    display name, and the announce/announce-list trackers.  Returns None
    on malformed/non-torrent bytes (buildFromFile returns None for
    non-bittorrent resources, Task.py:58-59)."""
    try:
        top, _end = _bdecode(b, 0)
    except (ValueError, IndexError, OverflowError):
        return None
    if not isinstance(top, dict) or b"info" not in top:
        return None
    start, end = top[b"__spans__"][b"info"]
    info_hash = hashlib.sha1(b[start:end]).hexdigest()
    info = top[b"info"]
    parts = [f"magnet:?xt=urn:btih:{info_hash}"]
    name = info.get(b"name") if isinstance(info, dict) else None
    if isinstance(name, bytes) and name:
        parts.append("dn=" + quote(name.decode("utf-8", "replace"), safe=""))
    trackers: list[bytes] = []
    al = top.get(b"announce-list")
    if isinstance(al, list):  # list of tiers, each a list of trackers
        for tier in al:
            for t in tier if isinstance(tier, list) else []:
                if isinstance(t, bytes) and t not in trackers:
                    trackers.append(t)
    ann = top.get(b"announce")
    if isinstance(ann, bytes) and ann not in trackers:
        trackers.append(ann)
    for t in trackers:
        parts.append("tr=" + quote(t.decode("utf-8", "replace"), safe=""))
    return "&".join(parts)


@F.pandas_udf(T.StringType())
def magnet_of_torrent(data: pd.Series) -> pd.Series:
    """Column-level Task.buildFromFile (/root/reference/src/Task.py:47-59):
    Arrow-batched map of ``.torrent`` payload bytes -> magnet URI, NULL
    for NULL input or non-torrent/malformed bytes.  Callers pass a
    ``when()``-guarded bytes column so non-torrent rows arrive NULL and
    cost only a null check (vectorized UDFs see the whole batch even
    under when()) — the crawl round attaches the magnet inline in its
    single fetch pass instead of re-running the fetch join for the
    torrent subset."""
    return data.map(
        lambda b: None if b is None else make_magnet_from_torrent(bytes(b))
    )


TORRENT_MAGNET_SCHEMA = "url string, magnet string, info_hash string"


def torrents_to_magnets(fetched: DataFrame, bytes_col: str = "body") -> DataFrame:
    """Task.buildFromFile over a fetch wave: rows whose content_type is
    ``application/x-bittorrent`` have their payload bencode-parsed into
    a magnet candidate task (url, magnet, info_hash).  Arrow-batched
    mapInPandas — bytes never become Python rows; malformed payloads are
    dropped, exactly like buildFromFile returning None.  The emitted
    magnets join the frontier and dedup on info_hash via the existing
    ``parse_magnet`` path (S6)."""
    import pandas as pd

    src = fetched.filter(
        fetched["content_type"] == "application/x-bittorrent"
    ).select("url", bytes_col)

    def conv(batches):
        for pdf in batches:
            urls, magnets, hashes = [], [], []
            for url, raw in zip(pdf["url"], pdf[bytes_col]):
                m = make_magnet_from_torrent(bytes(raw) if raw is not None else b"")
                if m is None:
                    continue
                urls.append(url)
                magnets.append(m)
                hashes.append(m.split("btih:", 1)[1].split("&", 1)[0])
            yield pd.DataFrame({"url": urls, "magnet": magnets, "info_hash": hashes})

    return src.mapInPandas(conv, schema=TORRENT_MAGNET_SCHEMA)


TORRENT_RESULT_COLS = [
    "status",            # int: 200 download complete, 408 stalled/stopped
    "content_sha224",    # sha224 over the downloaded payload dir manifest
    "children",          # array<string>: file paths inside the torrent
]


def torrent_fetch_stub(wave: DataFrame) -> DataFrame:
    """Signature-pinning stub for the transmission-rpc transfer.

    On a cluster with a transmission daemon per executor this becomes::

        def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = transmissionrpc.Client("localhost", port=9091)
            for pdf in batches:      # one Arrow batch of magnet URIs
                ids = [client.add_torrent(u).id for u in pdf.url]
                # poll get_torrent(id).progress == 100, bounded wait
                # (Slave.py:430-455), emit dir manifest + child paths
                yield pdf.assign(status=..., content_sha224=..., children=...)

        wave.mapInPandas(fetch_batch, schema=WAVE_SCHEMA + TORRENT_RESULT_COLS)

    Deliberately unimplemented in-sandbox (no transmission daemon, no
    peer egress); the magnet grammar and info-hash dedup are fully
    implemented and oracle-checked (``magnet_parse``).
    """
    raise NotImplementedError(
        "no transmission daemon / peer egress in this environment; "
        "magnet parsing + dedup are in functions/urls.py parse_magnet"
    )
