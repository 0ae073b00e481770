"""Deterministic synthetic-web generator (FIXTURES.md schemas).

Produces the five input tables — payloads, seeds, link_graph,
robots_rules (+ domain_rules) — as parquet, seeded and reproducible.
This replaces the live network: fetching a URL in-sandbox is a join
against ``link_graph`` (page metadata + outlinks) and ``payloads``
(the image+caption content, input_hint shape).

The shape mirrors what the reference crawls and how it fails:
  * status mix exercises every branch of the reference's header check
    (/root/reference/src/handlers/HTTPDefaultHandler.py:34-49)
  * malformed/relative outlinks exercise the canonicalizer
    (/root/reference/src/extractors/ExtractorFactory.py:50-66)
  * Zipf-skewed host fan-in produces hot hosts (the netarea-overload
    case, /root/reference/src/network/Reports.py:64-65) for salting/AQE
  * ~10%% of hosts carry robots disallow rules with overlapping
    prefixes (longest-match, /root/reference/src/Robot.py:27-81)
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.images import dhash64
from .functions.png import encode_rgb

_VOCAB = [f"w{i:03d}" for i in range(256)]
_SIZES = (16, 32, 64)


@dataclass(frozen=True)
class WebSpec:
    """One scale tier of the synthetic web (FIXTURES.md §8)."""

    n_hosts: int
    pages_per_host: int
    n_payloads: int  # pages share images when pages > payloads
    n_seeds: int
    seed: int = 42

    @property
    def n_pages(self) -> int:
        return self.n_hosts * self.pages_per_host


TIERS: dict[str, WebSpec] = {
    "tiny": WebSpec(n_hosts=8, pages_per_host=25, n_payloads=200, n_seeds=4),
    "small": WebSpec(n_hosts=64, pages_per_host=96, n_payloads=6000, n_seeds=16),
    "bench": WebSpec(n_hosts=512, pages_per_host=1172, n_payloads=60000, n_seeds=128),
}


def host_name(k: int) -> str:
    return f"host{k:04d}.test"


def page_url(k: int, j: int) -> str:
    return f"http://{host_name(k)}/page{j}"


# ---------------------------------------------------------------------------
# payloads
# ---------------------------------------------------------------------------


def gen_payloads(spec: WebSpec) -> pd.DataFrame:
    rows = []
    for i in range(spec.n_payloads):
        rng = np.random.default_rng(spec.seed ^ (i * 2654435761 + 1))
        w = _SIZES[i % 3]
        h = _SIZES[(i // 3) % 3]
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if i % 10 == 9:  # "jpeg" rows: lossy path — seeded noise within PSNR>=40dB
            fmt = "jpeg"
            noise = rng.integers(-2, 3, size=px.shape, dtype=np.int16)
            stored = np.clip(px.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        elif i % 37 == 5:  # content-type gate fodder (F6 reject path)
            fmt = "gif"
            stored = px
        else:
            fmt = "png"
            stored = px
        blob = encode_rgb(stored)
        n_words = 4 + int(rng.integers(0, 12))
        words = [_VOCAB[int(x)] for x in rng.integers(0, 256, size=n_words)]
        rows.append(
            {
                "image_id": f"img{i:08d}",
                "bytes": blob,
                "w": int(w),
                "h": int(h),
                "fmt": fmt,
                "caption": f"caption of img{i:08d}: " + " ".join(words),
                "phash": dhash64(stored),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# link_graph
# ---------------------------------------------------------------------------


def content_sha(url: str, epoch: int, stable: bool) -> str:
    """sha224 of page content; 80% of pages stable across epochs, 20%
    rotate — exercises the unchanged-content short-circuit
    (/root/reference/src/RessourceFactory.py:29-33)."""
    e = 0 if stable else epoch
    return hashlib.sha224(f"{url}|{e}".encode()).hexdigest()


def gen_link_graph(spec: WebSpec, epoch: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(spec.seed * 7 + 13)
    n_hosts, ppH = spec.n_hosts, spec.pages_per_host
    # Zipf-ish host popularity for cross-host links: host k weight 1/(k+1)
    weights = 1.0 / (np.arange(n_hosts) + 1.0)
    weights /= weights.sum()

    rows = []
    for k in range(n_hosts):
        # per-host rng so tiers are stable per host
        hrng = np.random.default_rng(spec.seed ^ (k * 1000003 + 7))
        for j in range(ppH):
            url = page_url(k, j)
            r = hrng.random()
            if r < 0.92:
                status = 200
            elif r < 0.95:
                status = 301 if hrng.random() < 0.5 else 302
            elif r < 0.97:
                status = 304
            else:
                status = 404 if hrng.random() < 0.5 else 500
            location = None
            if status in (301, 302):
                location = page_url(k, int(hrng.integers(0, ppH)))
            n_out = int(hrng.integers(0, 13))
            outlinks = []
            for _ in range(n_out):
                q = hrng.random()
                if q < 0.70:  # same-host absolute
                    outlinks.append(page_url(k, int(hrng.integers(0, ppH))))
                elif q < 0.95:  # cross-host, Zipf-hot fan-in
                    tgt = int(rng.choice(n_hosts, p=weights))
                    outlinks.append(page_url(tgt, int(hrng.integers(0, ppH))))
                else:  # relative / protocol-relative / malformed
                    qq = hrng.random()
                    if qq < 0.4:
                        outlinks.append(f"page{int(hrng.integers(0, ppH))}")
                    elif qq < 0.7:
                        outlinks.append(f"//{host_name(int(rng.choice(n_hosts, p=weights)))}/page{int(hrng.integers(0, ppH))}")
                    elif qq < 0.85:
                        outlinks.append("ht!tp://mal formed")
                    else:
                        outlinks.append(f"http://{host_name(k)}/page{int(hrng.integers(0, ppH))}#frag")
            stable = hrng.random() < 0.8
            rows.append(
                {
                    "url": url,
                    "image_id": f"img{int(hrng.integers(0, spec.n_payloads)):08d}",
                    "status": int(status),
                    "location": location,
                    "outlinks": outlinks,
                    "content_sha224": content_sha(url, epoch, stable),
                }
            )
        if k % 13 == 3:
            # sitemap page for hosts that declare one in robots_rules:
            # every 5th page listed (≙ XMLExtractor loc entries,
            # /root/reference/src/extractors/ExtractorFactory.py:26-68)
            smurl = f"http://{host_name(k)}/sitemap.xml"
            rows.append(
                {
                    "url": smurl,
                    "image_id": None,
                    "status": 200,
                    "location": None,
                    "outlinks": [page_url(k, j) for j in range(0, ppH, 5)],
                    "content_sha224": content_sha(smurl, epoch, True),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# robots / domain rules / seeds
# ---------------------------------------------------------------------------

_T0 = pd.Timestamp("2026-01-01T00:00:00Z")


def gen_robots(spec: WebSpec) -> pd.DataFrame:
    """Deterministic by host index: hosts k%7==2 carry overlapping
    disallow/allow prefixes (longest-match test, /root/reference/src/Robot.py:27-81);
    hosts k%13==3 declare a sitemap (/root/reference/src/Robot.py:78-79)."""
    rows = []
    for k in range(spec.n_hosts):
        host = host_name(k)
        sitemap = f"http://{host}/sitemap.xml" if k % 13 == 3 else None
        if k % 7 == 2:
            # /page1* disallowed except the longer /page12* rule re-allows
            rows.append({"host": host, "pattern": "/page1", "allow": False,
                         "sitemap_url": sitemap, "fetched_at": _T0, "ttl_s": 3600})
            rows.append({"host": host, "pattern": "/page12", "allow": True,
                         "sitemap_url": sitemap, "fetched_at": _T0, "ttl_s": 3600})
        elif sitemap:
            rows.append({"host": host, "pattern": "/", "allow": True,
                         "sitemap_url": sitemap, "fetched_at": _T0, "ttl_s": 3600})
    return pd.DataFrame(
        rows,
        columns=["host", "pattern", "allow", "sitemap_url", "fetched_at", "ttl_s"],
    )


def gen_domain_rules(spec: WebSpec) -> pd.DataFrame:
    """Host blocklist (F3, /root/reference/src/Slave.py:138-139):
    hosts k%19==5 are blocked."""
    rows = [
        {"host": host_name(k), "allowed": False}
        for k in range(0, spec.n_hosts)
        if k % 19 == 5
    ]
    return pd.DataFrame(rows, columns=["host", "allowed"])


def gen_seeds(spec: WebSpec) -> pd.DataFrame:
    rows = [
        {"url": page_url(k, 0), "depth": 0, "nature": "web_static"}
        for k in range(spec.n_seeds)
    ]
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# materialize
# ---------------------------------------------------------------------------


def generate(tier: str, out_dir: str, epoch: int = 0) -> dict[str, str]:
    """Write all tables for a tier to ``out_dir``; returns name->path."""
    spec = TIERS[tier]
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    tables = {
        "payloads": gen_payloads(spec),
        "link_graph": gen_link_graph(spec, epoch=epoch),
        "robots_rules": gen_robots(spec),
        "domain_rules": gen_domain_rules(spec),
        "seeds": gen_seeds(spec),
    }
    for name, df in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            path,
            coerce_timestamps="us",  # Spark cannot read TIMESTAMP(NANOS)
            allow_truncated_timestamps=True,
        )
        paths[name] = path
    return paths


if __name__ == "__main__":
    import sys

    tier = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/artemis_web_{tier}"
    print(generate(tier, out))
