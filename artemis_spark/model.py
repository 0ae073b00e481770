"""Pure-Python deterministic reference model of the crawl semantics.

This is the fixture oracle demanded by SURVEY.md §5: the reference's
filter chain (F1-F7), politeness, scoring and state transitions re-run
deterministically over the same synthetic-web tables, producing the
golden crawl order and URL-seen set the Spark engine must match.

The reference itself is thread-nondeterministic (racy deques, ARC
evictions, wall-clock TTLs — SURVEY.md §7 risk 1), so its semantics are
frozen here at round granularity with the deterministic tie-break
(host, score desc, url asc).  Dedup is exact (the reference's ARC at
test scale never evicts: 10^4 capacity >> fixture sizes,
/root/reference/src/Slave.py:112).

Every rule mirrors a cited reference behavior — see the operator
modules for the file:line mapping; this model and plans/crawl.py must
be changed in lockstep.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import quote

import pyarrow.parquet as pq

from .rounds import ROUND_SECONDS
from .schemas import MAX_REFRESH_RATE

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):")

ROBOTS_BLOCKED_STATUS = 999
AUTH_DEFERRED_STATUS = 998
TORRENT_QUEUED_STATUS = 997


# ---------------------------------------------------------------------------
# login-form grammar (mirror functions/markup.py parse_forms exactly;
# reference SigInForm.pick_fields, Form.py:43-57)
# ---------------------------------------------------------------------------

_FORM_BLOCK = re.compile(r"<form\b[^>]*>.*?</form\s*>", re.I | re.S)
_INPUT_TAG = re.compile(r"<input\b[^>]*>", re.I)
_ENT = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _unescape(s: str) -> str:
    for ent, ch in _ENT:
        s = s.replace(ent, ch)
    return s


def _attr(tag: str, name: str) -> str | None:
    m = re.search(rf"\b{name}\s*=\s*\"([^\"]*)\"", tag, re.I)
    if not m or not m.group(1):
        m = re.search(rf"\b{name}\s*=\s*'([^']*)'", tag, re.I)
    return _unescape(m.group(1)) if m and m.group(1) else None


# ---------------------------------------------------------------------------
# torrent grammar mirror (sources/torrents.py make_magnet_from_torrent;
# reference Task.buildFromFile, /root/reference/src/Task.py:47-59) —
# independently implemented: dict entries carry (value, start, end)
# triples instead of the engine parser's span side-table, so the two
# parsers only agree if the grammar itself is right.
# ---------------------------------------------------------------------------


def _bscan(b: bytes, i: int):
    """Decode one bencoded value at offset ``i`` -> (value, end); dict
    values are (value, start, end) triples so the caller can hash the
    exact byte span of ``info``."""
    c = b[i : i + 1]
    if c == b"i":
        e = b.index(b"e", i)
        return int(b[i + 1 : e]), e + 1
    if c == b"l":
        vals, i = [], i + 1
        while b[i : i + 1] != b"e":
            v, i = _bscan(b, i)
            vals.append(v)
        return vals, i + 1
    if c == b"d":
        d, i = {}, i + 1
        while b[i : i + 1] != b"e":
            k, i = _bscan(b, i)
            s = i
            v, i = _bscan(b, i)
            d[k] = (v, s, i)
        return d, i + 1
    if c.isdigit():
        col = b.index(b":", i)
        n = int(b[i:col])
        return b[col + 1 : col + 1 + n], col + 1 + n
    raise ValueError(f"malformed bencode at {i}")


def _magnet_from_torrent(b: bytes) -> tuple[str, str] | None:
    """(magnet_uri, info_hash) from .torrent bytes, or None when the
    payload is not a bittorrent metainfo file (buildFromFile returns
    None, Task.py:58-59)."""
    b = bytes(b)
    try:
        top, _ = _bscan(b, 0)
    except (ValueError, IndexError, OverflowError):
        return None
    if not isinstance(top, dict) or b"info" not in top:
        return None
    info, s, e = top[b"info"]
    ih = hashlib.sha1(b[s:e]).hexdigest()
    out = ["magnet:?xt=urn:btih:" + ih]
    name = info.get(b"name", (None, 0, 0))[0] if isinstance(info, dict) else None
    if isinstance(name, bytes) and name:
        out.append("dn=" + quote(name.decode("utf-8", "replace"), safe=""))
    trackers: list[bytes] = []
    al = top.get(b"announce-list", (None, 0, 0))[0]
    if isinstance(al, list):
        for tier in al:
            for t in tier if isinstance(tier, list) else []:
                if isinstance(t, bytes) and t not in trackers:
                    trackers.append(t)
    ann = top.get(b"announce", (None, 0, 0))[0]
    if isinstance(ann, bytes) and ann not in trackers:
        trackers.append(ann)
    for t in trackers:
        out.append("tr=" + quote(t.decode("utf-8", "replace"), safe=""))
    return "&".join(out), ih


def _parse_login_form(body: str) -> tuple[str, str, str | None] | None:
    """First login-classified form of the page as (user_field,
    pass_field, action), or None when no fillable login form exists
    (no form / no password input / NoUserField / NoPassField)."""
    for block in _FORM_BLOCK.findall(body):
        inputs = [
            (_attr(t, "name"), (_attr(t, "type") or "text").lower())
            for t in _INPUT_TAG.findall(block)
        ]
        if not any(typ == "password" for _n, typ in inputs):
            continue  # not login-classified
        user = next((n for n, t in inputs if t == "text" and n), None) or next(
            (n for n, t in inputs if t == "email" and n), None
        )
        passwd = next((n for n, t in inputs if t == "password" and n), None)
        if user is None or passwd is None:
            return None  # NoUserField / NoPassField -> login aborts
        open_tag = re.match(r"<form\b[^>]*>", block, re.I | re.S).group(0)
        return (user, passwd, _attr(open_tag, "action"))
    return None


# ---------------------------------------------------------------------------
# URL functions (mirror functions/urls.py exactly)
# ---------------------------------------------------------------------------


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — exact mirror of functions.urls.remove_dot_segments
    (same gate regex, same trailing-segment pre-rewrite, same fold)."""
    if not re.search(r"/\.\.?(/|$)", path):
        return path
    p = re.sub(r"/\.$", "/", path)
    p = re.sub(r"/\.\.$", "/../", p)
    out: list[str] = []
    for seg in p.split("/")[1:]:
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    return "/" + "/".join(out)


def canonicalize(url: str | None) -> str | None:
    if url is None:
        return None
    u = url.strip()
    if not u or re.search(r"\s", u):
        return None
    m = _SCHEME_RE.match(u)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = u[m.end():]
    if not rest.startswith("//"):
        return None
    rest = rest[2:]
    # netloc ends at first / ? #
    cut = len(rest)
    for ch in "/?#":
        i = rest.find(ch)
        if i != -1:
            cut = min(cut, i)
    host = rest[:cut].lower()
    if not host:
        return None
    tail = rest[cut:]
    # split path / query / fragment
    frag_i = tail.find("#")
    if frag_i != -1:
        tail = tail[:frag_i]
    q_i = tail.find("?")
    if q_i != -1:
        path, query = tail[:q_i], tail[q_i + 1 :]
    else:
        path, query = tail, ""
    path = re.sub(r";.*$", "", path)
    if path == "":
        path = "/"
    path = _remove_dot_segments(path)
    out = f"{scheme}://{host}{path}"
    if query:
        out += f"?{query}"
    return out


def resolve_url(parent: str, child: str | None) -> str | None:
    if child is None:
        return None
    c = child.strip()
    p = parent.strip()
    if not c:
        return None
    pm = _SCHEME_RE.match(p)
    p_scheme = pm.group(1).lower() if pm else None
    pc = canonicalize(p)
    if pc is None:
        return None
    host_part = pc.split("://", 1)[1]
    slash = host_part.find("/")
    p_host = host_part[:slash] if slash != -1 else host_part
    p_path = host_part[slash:] if slash != -1 else "/"
    p_path = p_path.split("?", 1)[0]
    p_dir = re.sub(r"[^/]*$", "", p_path)
    if _SCHEME_RE.match(c):
        return c
    if c.startswith("//"):
        return f"{p_scheme}:{c}"
    if c.startswith("/"):
        return f"{p_scheme}://{p_host}{c}"
    return f"{p_scheme}://{p_host}{p_dir}{c}"


def host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


def path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:].split("?", 1)[0] if i != -1 else "/"


def scheme_of(url: str) -> str | None:
    m = _SCHEME_RE.match(url)
    return m.group(1).lower() if m else None


def classify_nature(url: str) -> str:
    lu = url.lower()
    if lu.startswith("magnet:"):
        return "web_static_torrent"
    h = host_of(url) if "://" in url else ""
    if h.endswith(".onion"):
        return "web_static_tor"
    if lu.endswith("sitemap.xml"):
        return "web_static_sitemap"
    return "web_static"


# ---------------------------------------------------------------------------
# model state
# ---------------------------------------------------------------------------


@dataclass
class SeenEntry:
    depth: int
    score: float
    last_visited_round: int | None
    last_controlled_round: int
    last_hash: str
    refresh_rate: int
    nature: str
    round_added: int


@dataclass
class ModelConfig:
    politeness_budget: int = 8
    revisit_delay_rounds: int = 10**6
    allowed_schemes: tuple[str, ...] = ("http", "https")
    allowed_fmts: tuple[str, ...] = ("png", "jpeg")


class ReferenceModel:
    def __init__(self, web_dir: str, cfg: ModelConfig | None = None):
        self.cfg = cfg or ModelConfig()
        lg = pq.read_table(f"{web_dir}/link_graph.parquet").to_pylist()
        self.graph = {r["url"]: r for r in lg}
        pl = pq.read_table(
            f"{web_dir}/payloads.parquet", columns=["image_id", "fmt", "caption", "phash"]
        ).to_pylist()
        self.payloads = {r["image_id"]: r for r in pl}
        self.robots_rows = pq.read_table(f"{web_dir}/robots_rules.parquet").to_pylist()
        self.robots: dict[str, list[tuple[str, bool]]] = {}
        self.sitemap_of: dict[str, str] = {}
        for r in self.robots_rows:
            self.robots.setdefault(r["host"], []).append((r["pattern"], bool(r["allow"])))
            if r["sitemap_url"]:
                self.sitemap_of[r["host"]] = r["sitemap_url"]
        dr = pq.read_table(f"{web_dir}/domain_rules.parquet").to_pylist()
        self.blocked_hosts = {r["host"] for r in dr if not r["allowed"]}
        # accreditationRules (reference Task.py:12,41): defaultdict-to-'no'
        self.auth_rules: dict[str, str] = {}
        try:
            ar = pq.read_table(f"{web_dir}/auth_rules.parquet").to_pylist()
            self.auth_rules = {r["host"]: r["auth"] for r in ar}
        except FileNotFoundError:
            pass
        # per-host accounts (reference users table, User.py:28-37);
        # host -> session lifetime in seconds.  Hosts absent here can
        # never establish a session and defer forever.
        self.credentials: dict[str, int] = {}
        try:
            cr = pq.read_table(f"{web_dir}/credentials.parquet").to_pylist()
            self.credentials = {r["host"]: int(r["lifetime_s"]) for r in cr}
        except FileNotFoundError:
            pass
        # login pages for 'form' hosts: parsed with the Python mirror of
        # the engine's form grammar (FormHandler.extractOne +
        # SigInForm.pick_fields).  None = legacy web with no login_pages
        # table: form logins succeed unconditionally (pre-r04 behavior).
        self.login_forms: dict[str, tuple[str, str]] | None = None
        try:
            lp = pq.read_table(f"{web_dir}/login_pages.parquet").to_pylist()
            self.login_forms = {}
            for row in lp:
                f = _parse_login_form(bytes(row["body"]).decode("utf-8"))
                if f is not None:
                    self.login_forms[row["host"]] = f
        except FileNotFoundError:
            pass
        # host -> round the login was performed (AccreditationCache.py:18-30)
        self.sessions: dict[str, int] = {}
        self.seed_rows = pq.read_table(f"{web_dir}/seeds.parquet").to_pylist()

        self.seen: dict[str, SeenEntry] = {}
        self.host_inlinks: dict[str, int] = {}
        # candidate: (url, depth, nature, round_added)
        self.frontier: list[tuple[str, int, str, int]] = []
        self.crawl_log: list[dict] = []
        self.rounds: list[list[str]] = []  # scheduled+fetched urls per round, ordered

    # -- stage mirrors ---------------------------------------------------------

    def _bootstrap(self) -> None:
        cands = []
        for r in self.seed_rows:
            cu = canonicalize(r["url"])
            if cu is None:
                continue
            nature = r["nature"] or classify_nature(cu)
            cands.append((cu, int(r["depth"]), nature, 0))
        self.frontier = cands

    def _robots_allowed(self, url: str) -> bool:
        host = host_of(url)
        rules = self.robots.get(host)
        if not rules:
            return True
        path = path_of(url)
        best = None  # (plen, allow)
        for pattern, allow in rules:
            if pattern is not None and path.startswith(pattern):
                cand = (len(pattern), allow)
                if best is None or cand > best:
                    best = cand
        return True if best is None else best[1]

    def _score(self, depth: int, host: str) -> float:
        return -1000.0 * depth + min(float(self.host_inlinks.get(host, 0)), 999.0)

    def _can_login(self, host: str) -> bool:
        """Credentials exist AND the login is fillable: 'form' hosts need
        a parsed login form with both fields (SigInForm.fill_form raises
        NoUserField/NoPassField otherwise); http_basic hosts need no
        form.  Legacy webs without a login_pages table keep the pre-r04
        always-succeeds behavior."""
        if host not in self.credentials:
            return False
        if self.auth_rules.get(host, "no") != "form" or self.login_forms is None:
            return True
        return host in self.login_forms

    def run_round(self, r: int) -> list[str]:
        cfg = self.cfg
        # F2/F3 + nature gate
        cands = [
            c
            for c in self.frontier
            if scheme_of(c[0]) in cfg.allowed_schemes
            and c[2] not in ("web_static_tor", "web_static_torrent")
            and host_of(c[0]) not in self.blocked_hosts
        ]
        # within-batch dedupe: min depth, min nature, min round_added per url
        by_url: dict[str, tuple[int, str, int]] = {}
        for url, depth, nature, added in cands:
            cur = by_url.get(url)
            nxt = (depth, nature, added)
            if cur is None:
                by_url[url] = nxt
            else:
                by_url[url] = (min(cur[0], nxt[0]), min(cur[1], nxt[1]), min(cur[2], nxt[2]))
        # F4 validate vs seen (exact; bloom tier is a pure pre-filter)
        schedulable = []  # dicts with merged state
        for url, (depth, nature, added) in by_url.items():
            e = self.seen.get(url)
            if e is not None:
                age = r - e.last_controlled_round
                if age < e.refresh_rate * cfg.revisit_delay_rounds:
                    continue  # alive -> reject
                schedulable.append(
                    dict(url=url, depth=depth, nature=nature, round_added=added,
                         last_visited=e.last_visited_round, last_hash=e.last_hash,
                         refresh_rate=e.refresh_rate, was_seen=True)
                )
            else:
                schedulable.append(
                    dict(url=url, depth=depth, nature=nature, round_added=added,
                         last_visited=None, last_hash="", refresh_rate=1, was_seen=False)
                )
        # F5 robots
        allowed = [c for c in schedulable if self._robots_allowed(c["url"])]
        blocked = [c for c in schedulable if not self._robots_allowed(c["url"])]
        # auth lifecycle: gated hosts fetch only under a LIVE session
        # (now < established + lifetime); otherwise deferred — for one
        # round if a credentials row exists (the login performed this
        # round serves the next wave), forever if not.
        def _sess_live(host: str) -> bool:
            est = self.sessions.get(host)
            return (
                est is not None
                and (r - est) * ROUND_SECONDS < self.credentials[host]
            )

        auth_deferred, auth_ok = [], []
        for c in allowed:
            h = host_of(c["url"])
            if self.auth_rules.get(h, "no") == "no" or _sess_live(h):
                auth_ok.append(c)
            else:
                auth_deferred.append(c)
        allowed = auth_ok
        # login (FormHandler extractOne + fill + submit): each deferred
        # host with an account AND a fillable login form (parsed from
        # the host's login page — 'form' hosts only; http_basic needs no
        # form) gets a fresh session stamped this round
        for h in sorted({host_of(c["url"]) for c in auth_deferred}):
            if self._can_login(h):
                self.sessions[h] = r
        # score + politeness top-k
        by_host: dict[str, list[dict]] = {}
        for c in allowed:
            host = host_of(c["url"])
            c["host"] = host
            c["score"] = self._score(c["depth"], host)
            by_host.setdefault(host, []).append(c)
        scheduled, deferred = [], []
        for host, items in by_host.items():
            items.sort(key=lambda c: (-c["score"], c["url"]))
            scheduled.extend(items[: cfg.politeness_budget])
            deferred.extend(items[cfg.politeness_budget :])

        # fetch + gates + extraction
        next_frontier: list[tuple[str, int, str, int]] = []
        inlink_delta: dict[str, int] = {}
        # fetched .torrent payloads -> magnet tasks (Task.buildFromFile,
        # /root/reference/src/Task.py:47-59), deduped per wave on
        # info-hash with a deterministic min-tuple parent pick — must
        # match plans/crawl.py's groupBy(info_hash).agg(min(struct(...)))
        torrent_queue: dict[str, tuple[int, str, str, str]] = {}
        fetched_urls = sorted(scheduled, key=lambda c: (c["host"], -c["score"], c["url"]))
        for c, status in [(c, ROBOTS_BLOCKED_STATUS) for c in blocked] + [
            (c, AUTH_DEFERRED_STATUS) for c in auth_deferred
        ]:
            # deferred-but-loginable: refresh_rate=0 makes the recrawl
            # scan re-emit the URL next round, when the session is live;
            # robots blocks, credential-less hosts and hosts whose login
            # form cannot be filled back off to MAX
            rate = (
                0
                if status == AUTH_DEFERRED_STATUS
                and self._can_login(host_of(c["url"]))
                else MAX_REFRESH_RATE
            )
            self.seen[c["url"]] = SeenEntry(
                depth=c["depth"], score=0.0,
                last_visited_round=c["last_visited"], last_controlled_round=r,
                last_hash=c["last_hash"], refresh_rate=rate,
                nature=c["nature"], round_added=c["round_added"],
            )
            self.crawl_log.append(
                dict(round=r, url=c["url"], host=host_of(c["url"]),
                     status=status, image_id=None, phash=None, caption=None,
                     auth=self.auth_rules.get(host_of(c["url"]), "no"))
            )
        for c in scheduled:
            url = c["url"]
            g = self.graph.get(url)
            status = int(g["status"]) if g is not None else 404
            location = g["location"] if g is not None else None
            sha = g["content_sha224"] if g is not None else None
            image_id = g["image_id"] if g is not None else None
            pay = self.payloads.get(image_id) if image_id else None
            is_sitemap = c["nature"] == "web_static_sitemap"
            unchanged = status == 304 or (
                status == 200 and c["last_hash"] != "" and sha == c["last_hash"]
            )
            fmt_ok = is_sitemap or (pay is not None and pay["fmt"] in cfg.allowed_fmts)
            saved = status == 200 and not unchanged and fmt_ok
            backoff = (
                status in (301, 302, 304, 307, 308)
                or status >= 400
                or unchanged
                or (status == 200 and not unchanged and not fmt_ok)
            )
            self.crawl_log.append(
                dict(
                    round=r, url=url, host=c["host"], status=status,
                    image_id=image_id if saved else None,
                    phash=(pay["phash"] if (saved and pay and not is_sitemap) else None),
                    caption=(pay["caption"] if (saved and pay and not is_sitemap) else None),
                    auth=self.auth_rules.get(c["host"], "no"),
                )
            )
            torrent_parsed = False
            if (
                status == 200
                and not unchanged
                and url.endswith(".torrent")
                and g is not None
                and g.get("body")
            ):
                mg = _magnet_from_torrent(g["body"])
                if mg is not None:
                    torrent_parsed = True
                    magnet, ih = mg
                    tup = (
                        c["depth"],
                        c["host"],
                        self.auth_rules.get(c["host"], "no"),
                        magnet,
                    )
                    cur = torrent_queue.get(ih)
                    if cur is None or tup < cur:
                        torrent_queue[ih] = tup
            if status in (301, 302, 307, 308) and location:
                tgt = canonicalize(resolve_url(url, location))
                if tgt:
                    next_frontier.append((tgt, c["depth"], classify_nature(tgt), r + 1))
            if saved and g is not None:
                for raw in g["outlinks"] or []:
                    tgt = canonicalize(resolve_url(url, raw))
                    if tgt:
                        next_frontier.append((tgt, c["depth"] + 1, classify_nature(tgt), r + 1))
                        inlink_delta[host_of(tgt)] = inlink_delta.get(host_of(tgt), 0) + 1
            # a completed fetch clears the refresh_rate=0 session-retry
            # marker (mirrors greatest(1, rate) in plans/crawl.py)
            new_rate = (
                min(MAX_REFRESH_RATE, c["refresh_rate"] + 1)
                if backoff
                else max(1, c["refresh_rate"])
            )
            self.seen[url] = SeenEntry(
                depth=c["depth"], score=c["score"],
                last_visited_round=r, last_controlled_round=r,
                # a parsed .torrent records its sha even though nothing is
                # saved: F7 then suppresses re-parse/re-queue on recrawl
                last_hash=(sha if (saved or torrent_parsed) else c["last_hash"]),
                refresh_rate=new_rate, nature=c["nature"], round_added=c["round_added"],
            )
        # queued magnet tasks: logged with the handler-queue marker and
        # MERGEd into seen so the same info-hash is never re-queued while
        # the .torrent content is unchanged (the F7 short-circuit already
        # suppresses re-parsing); refresh_rate=MAX — in-sandbox there is
        # no transmission daemon to ever complete them (S6 stub)
        for ih in sorted(torrent_queue):
            pdepth, phost, pauth, magnet = torrent_queue[ih]
            self.crawl_log.append(
                dict(round=r, url=magnet, host=phost,
                     status=TORRENT_QUEUED_STATUS, image_id=None, phash=None,
                     caption=None, auth=pauth)
            )
            self.seen[magnet] = SeenEntry(
                depth=pdepth + 1, score=0.0,
                last_visited_round=None, last_controlled_round=r,
                last_hash="", refresh_rate=MAX_REFRESH_RATE,
                nature="web_static_torrent", round_added=r + 1,
            )
        # sitemap side-emit for hosts touched this round
        for host in sorted({c["host"] for c in scheduled}):
            sm = self.sitemap_of.get(host)
            if sm:
                cu = canonicalize(sm)
                if cu:
                    next_frontier.append((cu, 0, classify_nature(cu), r + 1))
        # deferred carryover — never-seen rows only: a was_seen deferred
        # row is still due next round and the recrawl scan re-derives it
        # (mirrors the engine's merge-on-read dedup of the two streams)
        for c in deferred:
            if not c["was_seen"]:
                next_frontier.append((c["url"], c["depth"], c["nature"], c["round_added"]))
        # A2 recrawl-due
        for url, e in self.seen.items():
            if (r + 1) - e.last_controlled_round >= e.refresh_rate * cfg.revisit_delay_rounds:
                next_frontier.append((url, e.depth, e.nature, r + 1))
        # host stats update
        for h, d in inlink_delta.items():
            self.host_inlinks[h] = self.host_inlinks.get(h, 0) + d

        self.frontier = next_frontier
        order = [c["url"] for c in fetched_urls]
        self.rounds.append(order)
        return order

    def run(self, n_rounds: int) -> dict:
        self._bootstrap()
        for r in range(n_rounds):
            if not self.frontier:
                break
            self.run_round(r)
        return {
            "rounds": self.rounds,
            "url_seen": {
                u: dict(last_hash=e.last_hash, refresh_rate=e.refresh_rate, depth=e.depth)
                for u, e in self.seen.items()
            },
            "crawl_log": self.crawl_log,
        }
