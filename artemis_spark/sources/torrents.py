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

from pyspark.sql import DataFrame

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
