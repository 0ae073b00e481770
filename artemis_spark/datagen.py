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
from .functions.markup import render_sitemap_xml
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
    "huge": WebSpec(n_hosts=2048, pages_per_host=1172, n_payloads=240000, n_seeds=512),
    # Scaling-evidence tier: 2x the hosts of "huge" at the same per-host
    # politeness budget, so steady-state waves are ~2x wider and a
    # low-parallelism round's wall time dominates the fixed per-round
    # driver cost (planning/codegen/commit) the way a real 10^10-URL
    # frontier round would.  Used by scaling_bench.py for the N -> 4N
    # efficiency pairs; identical input at every level (strong scaling).
    "huge4k": WebSpec(n_hosts=4096, pages_per_host=1172, n_payloads=480000, n_seeds=1024),
}


def host_name(k: int) -> str:
    return f"host{k:04d}.test"


def page_url(k: int, j: int) -> str:
    return f"http://{host_name(k)}/page{j}"


def torrent_url(k: int) -> str:
    """Hosts k%11==4 serve a bittorrent metainfo file (S6,
    Task.buildFromFile).  The path is keyed by k%22 — the same key as
    the CONTENT — so two torrent hosts out of every 22 serve byte-
    identical metainfo (same info-hash) and the wave-level info-hash
    dedup path is exercised at small+ tiers."""
    return f"http://{host_name(k)}/bundle{k % 22:04d}.torrent"


def torrent_bytes(g: int) -> bytes:
    """Deterministic bencoded metainfo for content key ``g``."""
    from .sources.torrents import bencode

    return bencode(
        {
            "announce": f"http://tracker{g:02d}.test/announce",
            "announce-list": [
                [f"udp://tracker{g:02d}.test:6969"],
                [f"http://tracker{g:02d}b.test/a"],
            ],
            "info": {
                "name": f"bundle{g:04d}",
                "piece length": 16384,
                "length": 4096 + g,
                "pieces": hashlib.sha1(f"pieces-{g}".encode()).digest(),
            },
        }
    )


# ---------------------------------------------------------------------------
# payloads
# ---------------------------------------------------------------------------


def _payload_row(args: tuple[int, int]) -> dict:
    i, seed = args
    rng = np.random.default_rng(seed ^ (i * 2654435761 + 1))
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
    return {
        "image_id": f"img{i:08d}",
        "bytes": blob,
        "w": int(w),
        "h": int(h),
        "fmt": fmt,
        "caption": f"caption of img{i:08d}: " + " ".join(words),
        "phash": dhash64(stored),
    }


def gen_payloads(spec: WebSpec) -> pd.DataFrame:
    """Per-index seeding keeps rows deterministic regardless of worker
    count, so large tiers encode in parallel."""
    args = [(i, spec.seed) for i in range(spec.n_payloads)]
    if spec.n_payloads >= 50000:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor() as pool:
            rows = list(pool.map(_payload_row, args, chunksize=2000))
    else:
        rows = [_payload_row(a) for a in args]
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# link_graph
# ---------------------------------------------------------------------------


def _escape_series(s: pd.Series) -> pd.Series:
    """Vectorized markup.escape_markup: & first, then < > \" '."""
    return (
        s.str.replace("&", "&amp;", regex=False)
        .str.replace("<", "&lt;", regex=False)
        .str.replace(">", "&gt;", regex=False)
        .str.replace('"', "&quot;", regex=False)
        .str.replace("'", "&#39;", regex=False)
    )


def _render_page_bodies(
    urls: pd.Series,
    links: pd.Series,
    offsets: np.ndarray,
    n_out: np.ndarray,
) -> list[bytes]:
    """Vectorized render_page_html over the flat outlink array: same
    grammar as functions/markup.py (base+title head, alternating
    <a href>/<img src> tags), built with pandas str ops because the huge
    tier renders 2.4M pages / ~14M tags."""
    N = len(urls)
    if len(links):
        wi = np.arange(len(links)) - offsets[:-1].repeat(n_out)  # idx within page
        esc = _escape_series(links)
        wis = pd.Series(wi).astype(str)
        tags = np.where(
            wi % 3 == 2,
            ('<img src="' + esc + '">').to_numpy(),
            ('<a href="' + esc + '">l' + wis + "</a>").to_numpy(),
        )
    else:
        tags = np.array([], dtype=object)
    joined = ["".join(tags[offsets[i]: offsets[i + 1]]) for i in range(N)]
    u_esc = _escape_series(urls)
    head = '<html><head><base href="' + u_esc + '"><title>' + u_esc + "</title></head><body>"
    return [
        (h + j + "</body></html>").encode("utf-8")
        for h, j in zip(head.to_numpy(), joined)
    ]


def content_sha(url: str, epoch: int, stable: bool) -> str:
    """sha224 of page content; 80% of pages stable across epochs, 20%
    rotate — exercises the unchanged-content short-circuit
    (/root/reference/src/RessourceFactory.py:29-33)."""
    e = 0 if stable else epoch
    return hashlib.sha224(f"{url}|{e}".encode()).hexdigest()


def _urls_vec(hosts: np.ndarray, pages: np.ndarray) -> pd.Series:
    """Vectorized 'http://host{k:04d}.test/page{j}' construction."""
    h = pd.Series(hosts).astype(str).str.zfill(4)
    return "http://host" + h + ".test/page" + pd.Series(pages).astype(str)


def gen_link_graph(spec: WebSpec, epoch: int = 0) -> pd.DataFrame:
    """Fully vectorized (numpy draws + pandas string ops): the huge tier
    is 2.4M pages / ~14M outlinks, which a per-row Python loop cannot
    generate in reasonable time."""
    rng = np.random.default_rng(spec.seed * 7 + 13)
    n_hosts, ppH = spec.n_hosts, spec.pages_per_host
    N = n_hosts * ppH
    # Zipf-ish host popularity for cross-host links: host k weight 1/(k+1)
    weights = 1.0 / (np.arange(n_hosts) + 1.0)
    weights /= weights.sum()

    K = np.repeat(np.arange(n_hosts), ppH)
    J = np.tile(np.arange(ppH), n_hosts)
    urls = _urls_vec(K, J)

    r = rng.random(N)
    status = np.full(N, 200, dtype=np.int64)
    status[(r >= 0.92) & (r < 0.935)] = 301
    status[(r >= 0.935) & (r < 0.95)] = 302
    status[(r >= 0.95) & (r < 0.97)] = 304
    status[(r >= 0.97) & (r < 0.985)] = 404
    status[r >= 0.985] = 500
    loc_pages = rng.integers(0, ppH, N)
    location = _urls_vec(K, loc_pages).where(pd.Series((status == 301) | (status == 302)), None)

    # outlinks: flat draw, then regroup by parent
    n_out = rng.integers(0, 13, N)
    L = int(n_out.sum())
    P = np.repeat(np.arange(N), n_out)  # parent page index per outlink
    q = rng.random(L)
    tgt_host = K[P].copy()
    cross = (q >= 0.70) & (q < 0.95)
    tgt_host[cross] = rng.choice(n_hosts, size=int(cross.sum()), p=weights)
    tgt_page = rng.integers(0, ppH, L)
    links = _urls_vec(tgt_host, tgt_page)
    # weird tail: relative / protocol-relative / malformed / fragment
    weird = q >= 0.95
    qq = rng.random(L)
    rel = weird & (qq < 0.4)
    proto = weird & (qq >= 0.4) & (qq < 0.7)
    mal = weird & (qq >= 0.7) & (qq < 0.85)
    frag = weird & (qq >= 0.85)
    pages_s = pd.Series(tgt_page).astype(str)
    links[rel] = "page" + pages_s[rel]
    # dot-segment relatives (lxml make_links_absolute collapses these;
    # so do resolve_url+canonicalize): ./pageN, ../pageN (above root),
    # and x/../pageN all canonicalize to /pageN — the model must agree
    dot1 = rel & (qq < 0.13)
    dot2 = rel & (qq >= 0.13) & (qq < 0.26)
    dot3 = rel & (qq >= 0.26) & (qq < 0.33)
    links[dot1] = ("./page" + pages_s)[dot1]
    links[dot2] = ("../page" + pages_s)[dot2]
    links[dot3] = ("sub/.././page" + pages_s)[dot3]
    proto_hosts = rng.choice(n_hosts, size=L, p=weights)
    links[proto] = (
        "//host" + pd.Series(proto_hosts).astype(str).str.zfill(4) + ".test/page" + pages_s
    )[proto]
    links[mal] = "ht!tp://mal formed"
    links[frag] = (_urls_vec(K[P], tgt_page) + "#frag")[frag]
    # regroup flat links into per-page lists
    link_arr = links.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(n_out)])
    outlinks = [link_arr[offsets[i]:offsets[i + 1]].tolist() for i in range(N)]

    # real page bodies (T2): HTML whose extraction yields exactly
    # `outlinks` — the markup grammar is the inverse of
    # functions/markup.py html_links (same as render_page_html, built
    # vectorized here because the huge tier renders 2.4M pages).
    bodies = _render_page_bodies(urls, links, offsets, n_out)

    stable = rng.random(N) < 0.8
    shas = [content_sha(u, epoch, bool(s)) for u, s in zip(urls, stable)]
    image_ids = pd.Series(rng.integers(0, spec.n_payloads, N)).astype(str).str.zfill(8)

    df = pd.DataFrame(
        {
            "url": urls,
            "image_id": "img" + image_ids,
            "status": status,
            "location": location,
            "outlinks": outlinks,
            "content_sha224": shas,
            "body": bodies,
        }
    )

    # sitemap pages for hosts that declare one in robots_rules: every
    # 5th page listed (≙ XMLExtractor loc entries,
    # /root/reference/src/extractors/ExtractorFactory.py:26-68)
    sm_rows = []
    for k in range(n_hosts):
        if k % 13 == 3:
            smurl = f"http://{host_name(k)}/sitemap.xml"
            sm_links = [page_url(k, j) for j in range(0, ppH, 5)]
            sm_rows.append(
                {
                    "url": smurl,
                    "image_id": None,
                    "status": 200,
                    "location": None,
                    "outlinks": sm_links,
                    "content_sha224": content_sha(smurl, epoch, True),
                    "body": render_sitemap_xml(sm_links),
                }
            )
    if sm_rows:
        df = pd.concat([df, pd.DataFrame(sm_rows)], ignore_index=True)

    # .torrent resources (S6, Task.buildFromFile): body is raw bencoded
    # metainfo, no image payload (the F6 gate rejects it from saving —
    # only the magnet-queue handler consumes it), no outlinks.
    tor_rows = []
    for k in range(n_hosts):
        if k % 11 != 4:
            continue
        turl = torrent_url(k)
        tor_rows.append(
            {
                "url": turl,
                "image_id": None,
                "status": 200,
                "location": None,
                "outlinks": [],
                "content_sha224": content_sha(turl, epoch, True),
                "body": torrent_bytes(k % 22),
            }
        )
    if tor_rows:
        df = pd.concat([df, pd.DataFrame(tor_rows)], ignore_index=True)
    return df


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


def gen_auth_rules(spec: WebSpec) -> pd.DataFrame:
    """Per-host accreditation rules (/root/reference/src/Task.py:12,41;
    AuthNature Task.py:22-27 enumerates no/form/http_basic/http_digest):
    hosts k%17==7 need a login form, k%23==11 http_basic, k%31==17
    http_digest; everyone else defaults to 'no' (defaultdict semantics —
    absent row = no auth)."""
    rows = []
    for k in range(spec.n_hosts):
        if k % 17 == 7:
            rows.append({"host": host_name(k), "auth": "form"})
        elif k % 23 == 11:
            rows.append({"host": host_name(k), "auth": "http_basic"})
        elif k % 31 == 17:
            rows.append({"host": host_name(k), "auth": "http_digest"})
    return pd.DataFrame(rows, columns=["host", "auth"])


def gen_credentials(spec: WebSpec) -> pd.DataFrame:
    """Per-host login credentials (reference users table,
    /root/reference/src/accreditation/User.py:28-37): every 'form' host
    has an account; 'http_basic' hosts only the even-numbered ones — the
    odd ones stay credential-less so the permanently-deferred path keeps
    coverage.  lifetime_s=7200 (two logical rounds) scales the reference
    apache-session default to the 1-round==1-hour logical clock: a
    session established in round r serves round r+1's wave and expires
    before r+2 (forcing a re-login round — expiry is exercised, progress
    still happens)."""
    rows = []
    for k in range(spec.n_hosts):
        auth = None
        if k % 17 == 7:
            auth = "form"
        elif k % 23 == 11 and k % 2 == 0:
            auth = "http_basic"
        elif k % 31 == 17 and k % 2 == 0:
            # challenge-response variant of basic: no form to parse, same
            # credentialed session flow (AuthNature.http_digest)
            auth = "http_digest"
        if auth:
            rows.append(
                {
                    "host": host_name(k),
                    "auth": auth,
                    "login": f"user{k:04d}",
                    "password": f"pw-{k:04d}",
                    "lifetime_s": 7200,
                }
            )
    return pd.DataFrame(
        rows, columns=["host", "auth", "login", "password", "lifetime_s"]
    )


def gen_login_pages(spec: WebSpec) -> pd.DataFrame:
    """Per-host login pages for 'form' hosts (reference FormHandler
    fetches the form URL and parses the real markup,
    /root/reference/src/accreditation/FormHandler.py:26-39).  Every page
    carries a decoy search form (classification must skip it); field
    names/types vary per host; every 4th form host (k//17 % 4 == 1)
    renders a BROKEN form with no password input — the NoPassField path:
    credentials exist but no login can be filled, so the host defers
    forever."""
    from .functions.markup import render_login_page

    rows = []
    for k in range(spec.n_hosts):
        if k % 17 != 7:
            continue
        host = host_name(k)
        broken = (k // 17) % 4 == 1
        rows.append(
            {
                "host": host,
                "url": f"http://{host}/login",
                "body": render_login_page(
                    host,
                    action=f"/sessions/s{k}",
                    user_field=f"user_f{k}",
                    pass_field=None if broken else f"pass_f{k}",
                    user_type="email" if (k // 17) % 3 == 2 else "text",
                ),
            }
        )
    return pd.DataFrame(rows, columns=["host", "url", "body"])


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
    # seed the .torrent files directly (their hosts' pages may never link
    # them): same-round fetches are what exercises the wave-level
    # info-hash dedup when two hosts serve identical metainfo
    rows += [
        {"url": torrent_url(k), "depth": 0, "nature": "web_static"}
        for k in range(spec.n_hosts)
        if k % 11 == 4
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
        "auth_rules": gen_auth_rules(spec),
        "credentials": gen_credentials(spec),
        "login_pages": gen_login_pages(spec),
        "seeds": gen_seeds(spec),
    }
    for name, df in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            path,
            coerce_timestamps="us",  # Spark cannot read TIMESTAMP(NANOS)
            allow_truncated_timestamps=True,
            # small row groups: a single-row-group file is unsplittable and
            # serializes the whole scan stage onto one Spark task
            row_group_size=2000 if name == "payloads" else 20000,
        )
        paths[name] = path
    return paths


if __name__ == "__main__":
    import sys

    tier = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/artemis_web_{tier}"
    print(generate(tier, out))
