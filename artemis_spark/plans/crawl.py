"""The crawl round loop — one Catalyst DAG per round.

This is the engine's flagship "query", the Spark re-expression of the
reference's full slave→master→slave cycle (SURVEY.md §3.1):

    candidates -> scheme/domain rules (F2,F3)
               -> within-batch dedupe
               -> bloom pre-filter (F1) -> exact validate (F4,A1)
               -> robots broadcast join (F5) [+ sitemap side-emit]
               -> score + per-host politeness top-k (§2.6)
               -> salted fetch wave (S2/S3, synthetic join in-sandbox)
               -> payload decode/phash pandas UDF (input_hint)
               -> content gates (F6 fmt, F7 unchanged-hash)
               -> outlink extraction (T2/T3) -> next candidates
               -> MERGE url_seen, append crawl_log + lineage_metrics

Each round commits atomically through the StateStore manifest, so a run
is resumable from any completed round (north_rule).  The reference's
equivalents are cited per stage in the operator modules.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import (
    canonicalize,
    classify_nature,
    host_of,
    host_partition_key,
    resolve_url,
    scheme_of,
)
from ..operators.bloom import (
    BloomShards,
    with_bloom_maybe_seen,
    with_bloom_maybe_seen_shard_local,
)
from ..operators.dedup import (
    as_new,
    bump_refresh_rate,
    dedupe_within_batch,
    split_by_bloom,
    validate_against_seen,
)
from ..functions.markup import first_login_form
from ..operators.politeness import politeness_ranked, with_score
from ..operators.robots import apply_robots_flags, sitemap_candidates
from ..rounds import EPOCH_SQL, ROUND_SECONDS, round_ts
from ..schemas import MAX_REFRESH_RATE, URL_SEEN_SCHEMA
from ..sources.fetch import build_payload_cache, build_web, synthetic_fetch
from ..sources.state import StateStore
from .. import schemas as S

ROBOTS_BLOCKED_STATUS = 999  # crawl_log marker for robots-rejected URLs
AUTH_DEFERRED_STATUS = 998  # crawl_log marker for auth-gated (deferred) URLs
TORRENT_QUEUED_STATUS = 997  # crawl_log marker for magnet tasks queued from .torrent payloads

CANDIDATE_COLS = ["url", "host", "depth", "nature", "round_added"]

import pyspark.sql.types as T

HOST_STATS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("inlinks", T.LongType(), True),
    ]
)

CANDIDATES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("nature", T.StringType(), True),
        T.StructField("round_added", T.IntegerType(), True),
    ]
)


@dataclass
class CrawlConfig:
    politeness_budget: int = 8  # per (host, round) — north_rule's explicit budget
    revisit_delay_rounds: int = 10**6  # effectively crawl-once; tests override (A2)
    num_partitions: int = 32
    allowed_schemes: tuple[str, ...] = ("http", "https")  # F2 protocolRules
    allowed_fmts: tuple[str, ...] = ("png", "jpeg")  # F6 content-type gate
    bloom_bits_per_shard: int = 1 << 20
    bloom_shards: int = 64
    # Scale-path probe: repartition candidates by shard id, each task loads
    # only its shard file (no S*m/8 broadcast).  Default False: at sandbox
    # shard sizes the broadcast is cheaper; at 4096x3MB it is mandatory.
    bloom_shard_local: bool = False
    # url_seen is stored partitioned by pmod(xxhash64(host), state_buckets);
    # a round rewrites only buckets containing updates and hard-links the
    # rest (Iceberg-manifest analogue) — O(dirty) not O(|state|) per round.
    # 256 by default (pinned in the manifest on first commit, so raising
    # it never mixes moduli within one state dir); at 10^10 URLs use 4096+.
    state_buckets: int = 256
    # >0 enables the delta-log MERGE layout: each round appends only its
    # update rows as a delta version (write cost O(|wave|) even when every
    # bucket is dirty); reads reconstruct last-writer-wins per url, and
    # the chain is compacted to a single base every N rounds to bound
    # read amplification.  0 = always rewrite dirty buckets (r02 layout).
    state_delta_max_chain: int = 8
    decode_payloads: bool = True  # disable for pure scheduler benchmarks
    # T2/T3: extract outlinks from the fetched page BYTES (html/sitemap
    # markup grammar, functions/markup.py) when the web fixture carries
    # bodies; False falls back to the link_graph.outlinks join.
    extract_markup: bool = True
    # salt>0 shapes the wave for a real per-host HTTP fetcher; the
    # synthetic join path leaves it 0 (the join partitions by url).
    fetch_salt: int = 0
    cache_web: bool = True  # cache link_graph/payloads partitioned on join keys
    light_stats: bool = False  # skip info-only frontier-size count (bench mode)
    # Truncate the lineage of each round's hot intermediates with
    # localCheckpoint(eager=False) instead of cache().  A round's tree
    # (chain reconstruction ∪ recrawl scan → dedupe → robots/auth →
    # politeness → fetch join → markup extraction → MERGE) feeds ~30
    # driver actions (writes, collects, counts); with cache() every one
    # of them re-analyzes and re-optimizes the FULL tree and AQE replans
    # it stage by stage — profiling showed the executors 98% idle
    # (wall 429s vs 291s total task time on 32 cores) with the wall
    # almost entirely single-threaded driver planning.  Pinning collapses
    # each materialized intermediate to a leaf scan so downstream plans
    # stay O(1)-sized however deep the round pipeline gets.  Losing RDD
    # lineage is safe by design: the committed state store is the
    # recovery mechanism (rounds are resumable), not Spark recompute.
    plan_pin: bool = True


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        web_dir: str,
        state_dir: str,
        config: CrawlConfig | None = None,
        seeds_path: str | None = None,
    ):
        self.spark = spark
        self.web_dir = web_dir
        self.cfg = config or CrawlConfig()
        self.seeds_path = seeds_path or f"{web_dir}/seeds.parquet"
        self.store = StateStore(spark, state_dir)
        self.link_graph = spark.read.parquet(f"{web_dir}/link_graph.parquet")
        self.payloads = spark.read.parquet(f"{web_dir}/payloads.parquet")
        # Two caches, not one pre-joined table: pages hash-partitioned by
        # host (co-located with the wave — per-round fetch joins are
        # exchange-free) and payload bytes hash-partitioned by image_id
        # (bytes attach per round only for fetched rows; pre-joining them
        # would replicate each shared image ~10x into a multi-GB cache).
        # On a cluster the same effect comes from Iceberg bucketed tables.
        self.has_markup = "body" in self.link_graph.columns
        use_markup = self.cfg.extract_markup and self.has_markup
        self.web = build_web(
            self.link_graph,
            self.cfg.num_partitions,
            # body and outlinks carry the same links twice; cache only the
            # one the configured extraction path (T2/T3) actually reads
            include_outlinks=not use_markup,
            include_body=use_markup,
        )
        self.payload_cache = build_payload_cache(self.payloads, self.cfg.num_partitions)
        if self.cfg.cache_web:
            self.web = self.web.persist()
            self.payload_cache = self.payload_cache.persist()
        self.robots = spark.read.parquet(f"{web_dir}/robots_rules.parquet")
        self.domain_rules = spark.read.parquet(f"{web_dir}/domain_rules.parquet")
        # per-host accreditation rules (reference Task.py:12,41); absent
        # file (pre-auth fixtures) == empty table == everything auth='no'.
        # Explicit casts: empty/all-NULL parquet columns arrive VOID-typed.
        auth_path = f"{web_dir}/auth_rules.parquet"
        if os.path.exists(auth_path):
            self.auth_rules = spark.read.parquet(auth_path).select(
                F.col("host").cast("string").alias("host"),
                F.col("auth").cast("string").alias("auth"),
            )
        else:
            self.auth_rules = spark.createDataFrame([], S.AUTH_RULES_SCHEMA)
        # per-host login credentials (reference users table,
        # /root/reference/src/accreditation/User.py:28-37); absent file ==
        # no accounts == every auth-gated host stays deferred (r02 shape).
        creds_path = f"{web_dir}/credentials.parquet"
        if os.path.exists(creds_path):
            self.credentials = spark.read.parquet(creds_path).select(
                F.col("host").cast("string").alias("host"),
                F.col("auth").cast("string").alias("auth"),
                F.col("login").cast("string").alias("login"),
                F.col("password").cast("string").alias("password"),
                F.col("lifetime_s").cast("int").alias("lifetime_s"),
            )
        else:
            self.credentials = spark.createDataFrame([], S.CREDENTIALS_SCHEMA)
        # login pages for 'form' hosts (reference FormHandler.extractOne
        # fetches the form URL and parses the real markup,
        # /root/reference/src/accreditation/FormHandler.py:26-39).
        # self.loginable = hosts whose login can actually be PERFORMED:
        # an account exists AND (http_basic, which needs no form, OR the
        # host's login page parses to a fillable login form — password
        # input present, user/password fields elected per
        # SigInForm.pick_fields, Form.py:43-57).  Hosts whose form cannot
        # be filled (NoUserField/NoPassField) are excluded: they defer
        # forever exactly like credential-less hosts.  Legacy webs
        # without a login_pages table keep the pre-r04 behavior (every
        # account loginable).  All lazy DataFrames: nothing is parsed
        # until a round actually consults it.
        _null_form = [
            F.lit(None).cast("string").alias(c)
            for c in ("form_action", "user_field", "pass_field")
        ]
        lp_path = f"{web_dir}/login_pages.parquet"
        if os.path.exists(lp_path):
            parsed = (
                spark.read.parquet(lp_path)
                .select(
                    F.col("host").cast("string").alias("host"),
                    F.col("url").cast("string").alias("url"),
                    first_login_form(F.col("body").cast("string")).alias("_f"),
                )
                .select(
                    "host",
                    # fill_form action fallback: form.action or base_url
                    # (= the login page URL), Form.py:76-78
                    F.coalesce(F.col("_f.action"), F.col("url")).alias("form_action"),
                    F.col("_f.user_field").alias("user_field"),
                    F.col("_f.pass_field").alias("pass_field"),
                )
                .filter(
                    F.col("user_field").isNotNull()
                    & F.col("pass_field").isNotNull()
                )
            )
            self.loginable = (
                self.credentials.filter(F.col("auth") != "form")
                .select("host", "auth", "login", "lifetime_s", *_null_form)
                .unionByName(
                    self.credentials.filter(F.col("auth") == "form")
                    .join(parsed, "host", "inner")
                    .select(
                        "host", "auth", "login", "lifetime_s",
                        "form_action", "user_field", "pass_field",
                    )
                )
            )
        else:
            self.loginable = self.credentials.select(
                "host", "auth", "login", "lifetime_s", *_null_form
            )
        self.seeds = spark.read.parquet(self.seeds_path)
        self._bloom: BloomShards | None = None
        self._round_bcs: list = []  # per-round bloom broadcasts, destroyed at round end

    def close(self) -> None:
        """Release session-held resources: the persisted web/payload
        caches and any live round bloom broadcasts.  Cached plans live in
        the session's CacheManager until explicitly unpersisted — they do
        NOT die with the engine object, so a long-lived session running
        many engines (test suites, notebook reuse) leaks heap without
        this."""
        for df in (self.web, self.payload_cache):
            try:
                df.unpersist()
            except Exception:
                pass
        while self._round_bcs:
            self._round_bcs.pop().destroy()

    # ------------------------------------------------------------------ state

    def _bloom_path(self, v: int) -> str:
        return f"{self.store.root}/bloom/v{v}"

    @property
    def bloom(self) -> BloomShards:
        if self._bloom is None:
            v = self.store.current_version("bloom")
            if v >= 0:
                legacy = self._bloom_path(v) + ".npz"  # pre-r2 single-file format
                self._bloom = BloomShards.load(
                    legacy if os.path.exists(legacy) else self._bloom_path(v)
                )
            else:
                self._bloom = BloomShards(self.cfg.bloom_shards, self.cfg.bloom_bits_per_shard)
        return self._bloom

    def bootstrap(self) -> None:
        """Round -1: frontier v0 = canonicalized seeds (S1,
        /root/reference/gateway.py:32-60)."""
        if self.store.last_round() >= -1 and self.store.current_version("frontier") >= 0:
            return
        seeds = self.seeds.select(
            canonicalize(F.col("url")).alias("url"),
            F.col("depth").cast("int").alias("depth"),
            # explicit cast: an all-null seeds.nature column type-infers as
            # non-string in parquet and coalesce would fail under ANSI
            # normalize: any unknown/missing nature is re-derived from the
            # URL so downstream code can assume the closed enum
            # (/root/reference/src/Task.py:16-20)
            F.when(
                F.col("nature").cast("string").isin(*S.NATURES),
                F.col("nature").cast("string"),
            ).otherwise(classify_nature(F.col("url"))).alias("nature"),
            F.lit(0).alias("round_added"),
        ).filter(F.col("url").isNotNull())
        seeds = seeds.withColumn("host", host_of(F.col("url"))).select(*CANDIDATE_COLS)
        fv = self.store.write_version("frontier", seeds)
        uv = self.store.write_version(
            "url_seen", self.spark.createDataFrame([], URL_SEEN_SCHEMA)
        )
        hv = self.store.write_version(
            "host_stats", self.spark.createDataFrame([], HOST_STATS_SCHEMA)
        )
        self.store.commit(-1, {"frontier": fv, "url_seen": uv, "host_stats": hv})

    # ------------------------------------------------------------------ round

    @staticmethod
    def _stale(df: DataFrame, at_round: int, delay_rounds: int) -> DataFrame:
        """A2 staleness (/root/reference/src/Task.py:94-95 inverted):
        at_round - last_controlled_round >= refresh_rate * delay."""
        return df.filter(
            (
                F.lit(at_round)
                - (
                    (
                        F.unix_timestamp("last_controlled")
                        - F.unix_timestamp(F.lit(EPOCH_SQL))
                    )
                    / F.lit(ROUND_SECONDS)
                ).cast("long")
            )
            >= F.col("refresh_rate").cast("long") * F.lit(delay_rounds)
        )

    def run_round(self) -> dict:
        cfg = self.cfg
        r = self.store.last_round() + 1
        now = round_ts(r)
        t_start = time.monotonic()
        shard = lambda c: host_partition_key(c, cfg.num_partitions)
        # One bucket modulus for every host-keyed state table (url_seen,
        # robots_cache, host_stats), pinned in the manifest on first
        # commit — a resume with a different cfg.state_buckets would
        # otherwise prune with the stored modulus while writing under the
        # new one, duplicating keys across buckets.
        stored_b = self.store.manifest().get("state_buckets")
        n_buckets = int(stored_b) if stored_b else cfg.state_buckets
        bucket_of = lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")

        def _pin(df: DataFrame) -> DataFrame:
            """Materialize-once node: localCheckpoint truncates the plan
            (downstream actions see a leaf scan, not the round's whole
            tree — see cfg.plan_pin), cache() keeps full lineage."""
            return df.localCheckpoint(eager=False) if cfg.plan_pin else df.cache()

        import os as _os
        _timing = bool(int(_os.environ.get("ARTEMIS_ROUND_TIMING", "0")))
        _phases: dict[str, float] = {}
        _last = [t_start]

        def _mark(name: str) -> None:
            if _timing:
                t = time.monotonic()
                _phases[name] = round(t - _last[0], 2)
                _last[0] = t

        # A2 recrawl scheduler (/root/reference/src/Master.py:330-342),
        # merge-on-READ: stale URLs are derived from the committed
        # url_seen snapshot when the round starts instead of being
        # re-written into the frontier at round end — the frontier table
        # stays O(|new links|) while recrawl-heavy steady state would
        # otherwise rewrite O(|state|) rows every round (the r02 bench's
        # largest single write).  The filter is identical to the old
        # round-end `_stale(merged_state, r+1)` evaluated one round later.
        url_seen_pre = self.store.read("url_seen", URL_SEEN_SCHEMA)
        if len(self.store.delta_chain("url_seen")) > 1:
            # delta-layout read is a reconstruction aggregate consumed by
            # several jobs this round (recrawl scan, validate join, merge/
            # compaction) — materialize it once instead of recomputing
            url_seen_pre = _pin(url_seen_pre)
        recrawl_due = self._stale(url_seen_pre, r, cfg.revisit_delay_rounds).select(
            "url", "host", "depth", "nature", F.lit(r).alias("round_added")
        )

        # F2 protocol rules + nature gating (tor/torrent unfetchable
        # in-sandbox) and F3 domain rules (broadcast blocklist anti-join)
        # apply BEFORE the routing exchange: the light_stats emptiness
        # probe below can then take(1) partition-by-partition over the
        # union — frontier splits first, so the common (non-empty) case
        # never evaluates the recrawl member, whose delta-chain
        # reconstruction aggregate would otherwise run a full O(|state|)
        # shuffle every round just to prove the round is non-empty.
        blocked_hosts = self.domain_rules.filter(~F.col("allowed")).select("host")

        def _gate(df):
            return df.filter(
                scheme_of(F.col("url")).isin(*cfg.allowed_schemes)
                & ~F.col("nature").isin("web_static_tor", "web_static_torrent")
            ).join(F.broadcast(blocked_hosts), "host", "left_anti")

        frontier_raw = self.store.read("frontier", CANDIDATES_SCHEMA)
        pre_shuffle = _gate(frontier_raw.unionByName(recrawl_due))
        _mark('state_reads')

        # THE routing shuffle (reference P2, /root/reference/src/Slave.py:145-172):
        # one hash exchange by host up front; every downstream join/window/
        # groupBy on the wave path keys by (host, ...) so Catalyst reuses
        # this partitioning and plans the rest of the round exchange-free.
        candidates = _pin(dedupe_within_batch(
            pre_shuffle.repartition(cfg.num_partitions, "host")
        ))
        if cfg.light_stats:
            # emptiness only, two-step: the frontier-only probe is one
            # parquet split's worth of work, and under AQE it is the only
            # shape that stays cheap — isEmpty on the full union would
            # materialize the recrawl member's delta-reconstruction
            # shuffle stage (O(|state|), growing every round) before the
            # limit even runs.  Only a drained frontier (end of crawl)
            # pays for the exact recrawl-inclusive probe.
            n_in = None  # count skipped under light_stats (key kept, value None)
            round_is_empty = _gate(frontier_raw).isEmpty() and pre_shuffle.isEmpty()
        else:
            n_in = candidates.count()
            round_is_empty = n_in == 0
        _mark('candidates_count')
        if round_is_empty:
            candidates.unpersist()
            url_seen_pre.unpersist()  # cached when the delta chain is long
            self._commit_empty(r, t_start)
            return {"round": r, "scheduled": 0, "fetched": 0, "new_candidates": 0}

        # F1 bloom pre-filter -> F4 exact validate
        url_seen = url_seen_pre
        bloom_v = self.store.current_version("bloom")
        if (
            cfg.bloom_shard_local
            and bloom_v >= 0
            and os.path.isdir(self._bloom_path(bloom_v))
        ):
            probed = with_bloom_maybe_seen_shard_local(
                candidates, self._bloom_path(bloom_v), cfg.num_partitions
            )
        else:
            # broadcast probe (also round 0 / legacy-npz states, where no
            # per-shard directory exists yet)
            probed = with_bloom_maybe_seen(
                self.spark, candidates, self.bloom, bc_registry=self._round_bcs
            )
        definitely_new, maybe_seen = split_by_bloom(probed)
        schedulable = as_new(definitely_new).unionByName(
            validate_against_seen(maybe_seen, url_seen, r, cfg.revisit_delay_rounds)
        )

        # F5 robots with an honest TTL cache (/root/reference/src/Robot.py:91-98):
        # per-host rules carry their REAL fetch time in the persisted
        # robots_cache table.  Hosts needed this round whose entry is
        # missing or TTL-expired are re-fetched (in-sandbox: re-read from
        # the live robots source) and stamped fetched_at=now; live entries
        # are served from cache even if the source changed — exactly the
        # staleness window a real crawler has.  Rule-less hosts get a
        # NULL-pattern sentinel row so they are not re-fetched every round
        # (negative caching, ≙ RobotCache caching empty parsers).
        #
        # At-scale shape (VERDICT r03 #2/#3): the wave only consults rules
        # for ITS OWN hosts, so everything here is wave-bounded —
        #   cache_slice  stored rows for wave hosts, read under a
        #                PartitionFilter on the STORED bucket column;
        #   refreshed    re-fetched rules for the missing/expired subset
        #                (the robots SOURCE is streamed with a broadcast
        #                semi-join on that tiny host set; the full source
        #                is NEVER broadcast — at 10^8 hosts that
        #                broadcast cannot build);
        #   wave_rules   live cache_slice ∪ refreshed — all that
        #                apply_robots/sitemap discovery need.
        robots_cache_raw = self.store.read("robots_cache", S.ROBOTS_SCHEMA)
        rc_has_bucket = "bucket" in robots_cache_raw.columns
        cand_hosts = _pin(candidates.select("host").distinct())
        wave_buckets = sorted(
            int(x["b"])
            for x in cand_hosts.select(bucket_of(F.col("host")).alias("b"))
            .distinct()
            .collect()
        )
        cache_slice = _pin(
            (
                robots_cache_raw.filter(F.col("bucket").isin(wave_buckets))
                if rc_has_bucket
                else robots_cache_raw
            )
            .drop("bucket")
            .join(F.broadcast(cand_hosts), "host", "left_semi")
        )
        live_slice = cache_slice.filter(
            F.unix_timestamp(F.lit(now))
            <= F.unix_timestamp("fetched_at") + F.col("ttl_s")
        )
        need = cand_hosts.join(
            F.broadcast(live_slice.select("host").distinct()), "host", "left_anti"
        )
        # explicit casts: an all-NULL column in a user-supplied robots
        # parquet arrives VOID-typed and corrupts downstream unions
        src_rules = (
            self.robots.drop("fetched_at")
            .join(F.broadcast(need), "host", "left_semi")
            .select(
                "host",
                F.col("pattern").cast("string").alias("pattern"),
                F.col("allow").cast("boolean").alias("allow"),
                F.col("sitemap_url").cast("string").alias("sitemap_url"),
                F.lit(now).alias("fetched_at"),
                F.coalesce(F.col("ttl_s").cast("int"), F.lit(3600)).alias("ttl_s"),
            )
        )
        src_rules = _pin(src_rules)
        no_rules = need.join(
            F.broadcast(src_rules.select("host").distinct()), "host", "left_anti"
        ).select(
            "host",
            F.lit(None).cast("string").alias("pattern"),
            F.lit(None).cast("boolean").alias("allow"),
            F.lit(None).cast("string").alias("sitemap_url"),
            F.lit(now).alias("fetched_at"),
            F.lit(3600).alias("ttl_s"),
        )
        refreshed = _pin(src_rules.unionByName(no_rules))
        wave_rules = _pin(live_slice.unionByName(refreshed))
        # Auth annotation (accreditationRules, reference Task.py:12,41;
        # AuthNature Task.py:22-27): one broadcast join on the schedulable
        # set gives every downstream branch (allowed, robots-blocked,
        # deferred) its auth marker.
        schedulable = schedulable.join(
            F.broadcast(self.auth_rules), "host", "left"
        ).withColumn("auth", F.coalesce(F.col("auth"), F.lit("no")))
        decided = apply_robots_flags(schedulable, wave_rules, now)

        # Auth lifecycle (reference AccreditationCache/FormHandler,
        # /root/reference/src/accreditation/AccreditationCache.py:18-30,
        # FormHandler.py:9-36): an auth-gated host's URLs are fetchable
        # only under a LIVE session (now < established_at + lifetime_s).
        # First contact defers the URLs for one round (the form must be
        # fetched and parsed) while a login establishes the session; the
        # next round's wave fetches them with the session marker.  Hosts
        # with no credentials row defer forever (the r02 behavior).
        auth_sessions = self.store.read("auth_sessions", S.AUTH_SESSIONS_SCHEMA)
        live_sess_hosts = (
            auth_sessions.filter(
                F.unix_timestamp(F.lit(now))
                < F.unix_timestamp("established_at") + F.col("lifetime_s")
            )
            .select("host")
            .distinct()
        )
        # One broadcast LEFT join + flag columns, NOT a union/split of
        # semi/anti branches.  The whole gate chain (bloom probe ->
        # validate join -> robots join -> auth flags) is materialized
        # ONCE as the `gated` pin; every branch below — robots_blocked,
        # auth_deferred, fetchable — is a filter SCAN of that pin.
        # Previously each branch was its own lazy pin whose first action
        # re-executed the unpinned chain from `candidates`, so the same
        # O(wave) work (including the Arrow bloom UDF and the validate
        # join against url_seen) ran up to 4x per round — the dominant
        # share of the r4 "seen_updates materialize" phase.
        live_flagged = decided.join(
            F.broadcast(live_sess_hosts.withColumn("_live", F.lit(True))),
            "host",
            "left",
        )
        gated = _pin(live_flagged)
        robots_blocked = gated.filter(~F.col("robots_allowed")).drop(
            "robots_allowed", "_live"
        )
        auth_deferred = gated.filter(
            F.col("robots_allowed")
            & (F.col("auth") != "no")
            & F.col("_live").isNull()
        ).drop("robots_allowed", "_live")
        fetchable = gated.filter(
            F.col("robots_allowed") & ((F.col("auth") == "no") | F.col("_live"))
        ).drop("robots_allowed", "_live")

        # Login round: every deferred host whose login is PERFORMABLE
        # (credentials + parsed fillable form for 'form' hosts — see
        # self.loginable) gets a session stamped this round.  The
        # session id commits to the PARSED form evidence (action +
        # elected field names — FormHandler extractOne -> pick_fields ->
        # fill_form + submit, minus the network); for http_basic hosts
        # the form columns are NULL and concat_ws reduces to the
        # form-less host|login|round id.  The deferred host set (wave-
        # bounded, tiny) is the broadcast side; loginable streams.
        new_sessions = (
            self.loginable.join(
                F.broadcast(auth_deferred.select("host").distinct()),
                "host",
                "left_semi",
            )
            .select(
                "host",
                "auth",
                F.sha2(
                    F.concat_ws(
                        "|",
                        F.col("host"), F.col("login"), F.col("form_action"),
                        F.col("user_field"), F.col("pass_field"), F.lit(str(r)),
                    ),
                    224,
                ).alias("session_id"),
                F.lit(now).alias("established_at"),
                F.col("lifetime_s").cast("int").alias("lifetime_s"),
            )
        )
        sessions_next = auth_sessions.join(
            new_sessions.select("host"), "host", "left_anti"
        ).unionByName(new_sessions)

        # §2.6 priority + politeness top-k.  The score join consults only
        # wave hosts: PartitionFilter on the stored bucket column (pushes
        # through the delta-chain sum aggregate — the grouping includes
        # bucket) + broadcast semi-join, so with_score broadcasts
        # O(|wave hosts|) rows, never the full per-host history.
        host_stats_raw = self.store.read("host_stats", HOST_STATS_SCHEMA)
        hs_has_bucket = "bucket" in host_stats_raw.columns
        hs_slice = (
            (
                host_stats_raw.filter(F.col("bucket").isin(wave_buckets))
                if hs_has_bucket
                else host_stats_raw
            )
            .drop("bucket")
            .join(F.broadcast(cand_hosts), "host", "left_semi")
        )
        scored = with_score(fetchable, hs_slice)
        # one window evaluation (the gated pin preserves the routing
        # exchange's host partitioning through localCheckpoint, so the
        # window plans sort-only); scheduled and deferred are filter
        # scans of the ranked pin
        ranked = _pin(politeness_ranked(scored))
        scheduled = ranked.filter(F.col("_rk") <= cfg.politeness_budget).drop("_rk")
        deferred = ranked.filter(F.col("_rk") > cfg.politeness_budget).drop("_rk")

        # S2/S3 fetch wave: co-partitioned join against the cached web.
        # (cfg.fetch_salt shapes a real-HTTP wave; the synthetic join path
        # keeps host partitioning so the join needs no exchange at all.)
        wave = scheduled
        if cfg.fetch_salt > 0:
            from ..functions.urls import salted_host

            wave = wave.repartition(
                cfg.num_partitions, salted_host(F.col("host"), F.col("url"), cfg.fetch_salt)
            )
        fetched = synthetic_fetch(wave, self.web, self.payload_cache)

        # F7 unchanged-content short-circuit (304 or same sha224)
        unchanged = (F.col("status") == 304) | (
            (F.col("status") == 200)
            & (F.col("last_hash") != "")
            & (F.col("content_sha224") == F.col("last_hash"))
        )
        # F6 content-type gate (sitemaps carry no image payload).  NULL
        # fmt (a 200 row with no image payload at all, e.g. a .torrent
        # file) must gate as False, not NULL: backoff_needed's ~fmt_ok
        # conjunct would otherwise go NULL and skip the backoff bump.
        is_sitemap = F.col("nature") == "web_static_sitemap"
        fmt_ok = is_sitemap | F.coalesce(
            F.col("fmt").isin(*cfg.allowed_fmts), F.lit(False)
        )
        saved = (F.col("status") == 200) & ~unchanged & fmt_ok

        fetched = (
            fetched.withColumn("unchanged", unchanged)
            .withColumn("saved", saved)
            .withColumn("extractable", saved)
        )

        # S6 .torrent -> magnet (Task.buildFromFile,
        # /root/reference/src/Task.py:47-59): a fetched, changed
        # ``.torrent`` payload is bencode-parsed into a magnet URI inline
        # in the fetch pass — the when()-guard NULLs the bytes for every
        # non-torrent row, so the Arrow transfer ships nulls and the UDF
        # pays only a null check outside the (rare) torrent rows.  NULL
        # magnet == not a torrent fetch / malformed metainfo.
        has_body = "body" in fetched.columns
        if has_body:
            from ..sources.torrents import magnet_of_torrent

            is_torrent_fetch = (
                (F.col("status") == 200)
                & ~F.col("unchanged")
                & F.col("url").endswith(".torrent")
                & F.col("body").isNotNull()
            )
            fetched = fetched.withColumn(
                "magnet",
                magnet_of_torrent(F.when(is_torrent_fetch, F.col("body"))),
            )
        else:
            fetched = fetched.withColumn("magnet", F.lit(None).cast("string"))

        if cfg.decode_payloads:
            from ..functions.images import decode_validate_image

            fetched = fetched.withColumn(
                "decoded",
                F.when(
                    F.col("saved") & ~is_sitemap & F.col("bytes").isNotNull(),
                    decode_validate_image(F.col("bytes")),
                ),
            ).withColumn("computed_phash", F.col("decoded.phash"))
        else:
            fetched = fetched.withColumn("computed_phash", F.lit(None).cast("long"))
        use_markup = cfg.extract_markup and self.has_markup
        if use_markup:
            from ..functions.markup import extract_outlinks

            # T1 dispatch + T2/T3 extraction over the real page bytes
            # (html href/src grammar vs sitemap <loc> grammar by nature),
            # evaluated once while the cache materializes: the cache holds
            # only the small extracted array, never the body bytes.
            fetched = fetched.withColumn(
                "ex",
                F.when(
                    F.col("extractable"),
                    extract_outlinks(F.col("body"), F.col("nature")),
                ),
            ).drop("outlinks")
        fetched = _pin(fetched.drop("bytes", "body"))

        # S6 wave-level info-hash dedup: two .torrent URLs serving the
        # SAME metainfo (identical bytes -> identical info-hash) must
        # queue ONE magnet task; the winner is the deterministic
        # min-(depth, host, auth, magnet) parent — struct min == the
        # model's lexicographic tuple min.  Tiny per-wave set (torrent
        # rows only), one hash aggregate.
        torrent_queue = (
            fetched.filter(F.col("magnet").isNotNull())
            .select(
                F.regexp_extract("magnet", "btih:([0-9a-f]{40})", 1).alias("info_hash"),
                F.struct("depth", "host", "auth", "magnet").alias("t"),
            )
            .groupBy("info_hash")
            .agg(F.min("t").alias("t"))
            .select(
                F.col("t.depth").alias("depth"),
                F.col("t.host").alias("host"),
                F.col("t.auth").alias("auth"),
                F.col("t.magnet").alias("magnet"),
            )
        )

        # ----- crawl log (S8/S9 sink)
        # payload validation (input_hint): decoded dims + phash must match
        # the fixture metadata; NULL when nothing was decoded this round
        payload_ok = F.when(
            F.col("saved") & F.col("computed_phash").isNotNull(),
            (F.col("computed_phash") == F.col("expected_phash"))
            & (F.col("decoded.w") == F.col("expected_w").cast("int"))
            & (F.col("decoded.h") == F.col("expected_h").cast("int")),
        ) if cfg.decode_payloads else F.lit(None).cast("boolean")
        crawl_log = fetched.select(
            F.lit(r).alias("round"),
            "url",
            "host",
            "status",
            F.when(F.col("saved"), F.col("image_id")).alias("image_id"),
            F.when(F.col("saved"), F.col("computed_phash")).alias("phash"),
            F.when(F.col("saved"), F.col("caption")).alias("caption"),
            payload_ok.alias("payload_ok"),
            F.lit(now).alias("fetched_at"),
            "auth",  # 'no' for plain rows; auth nature for session fetches
        ).unionByName(
            robots_blocked.select(
                F.lit(r).alias("round"),
                "url",
                "host",
                F.lit(ROBOTS_BLOCKED_STATUS).alias("status"),
                F.lit(None).cast("string").alias("image_id"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("boolean").alias("payload_ok"),
                F.lit(now).alias("fetched_at"),
                "auth",
            )
        ).unionByName(
            auth_deferred.select(
                F.lit(r).alias("round"),
                "url",
                "host",
                F.lit(AUTH_DEFERRED_STATUS).alias("status"),
                F.lit(None).cast("string").alias("image_id"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("boolean").alias("payload_ok"),
                F.lit(now).alias("fetched_at"),
                "auth",
            )
        ).unionByName(
            # queued magnet tasks (handler-queue marker): host/auth are
            # the winning parent's — the task is attributed to the page
            # that supplied the metainfo, like the reference's task
            # parentage (Task.buildFromFile inherits the parent task)
            torrent_queue.select(
                F.lit(r).alias("round"),
                F.col("magnet").alias("url"),
                "host",
                F.lit(TORRENT_QUEUED_STATUS).alias("status"),
                F.lit(None).cast("string").alias("image_id"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("boolean").alias("payload_ok"),
                F.lit(now).alias("fetched_at"),
                "auth",
            )
        )

        # ----- T2/T3 extraction -> next-round candidates
        # parent depth is carried through the explode (join-free)
        redirects = (
            fetched.filter(F.col("status").isin(301, 302, 307, 308) & F.col("location").isNotNull())
            .select("depth", resolve_url(F.col("url"), F.col("location")).alias("_abs"))
            .select("depth", canonicalize(F.col("_abs")).alias("url"))
            .filter(F.col("url").isNotNull())
        )
        # Staged projections on purpose: resolve_url and canonicalize each
        # reference their input many times, so fusing them into one Project
        # duplicates every regex ~5x and blows the whole-stage-codegen
        # method limit (Spark then falls back to interpreted eval on the
        # hottest path of the round).  Materializing `_abs` as a column
        # keeps each regex evaluated once per row; CollapseProject leaves
        # multi-referenced non-trivial aliases alone.
        if use_markup:
            ex_exploded = fetched.filter(F.col("extractable")).select(
                # resolve_base_href: a <base href> overrides the page URL
                # as resolution parent (ExtractorFactory.py:84-86)
                F.coalesce(F.col("ex.base"), F.col("url")).alias("parent"),
                (F.col("depth") + 1).alias("depth"),
                F.explode_outer("ex.links").alias("raw"),
            )
        else:
            ex_exploded = fetched.filter(F.col("extractable")).select(
                F.col("url").alias("parent"),
                (F.col("depth") + 1).alias("depth"),
                F.explode_outer("outlinks").alias("raw"),
            )
        extracted_with_depth = _pin(
            ex_exploded
            .select("depth", resolve_url(F.col("parent"), F.col("raw")).alias("_abs"))
            .select("depth", canonicalize(F.col("_abs")).alias("url"))
            .filter(F.col("url").isNotNull())
            .withColumn("host", host_of(F.col("url")))
        )

        # sitemap discovery reads the robots CACHE (sitemaps are found when
        # robots is fetched/parsed, Robot.py:78-79,134-137)
        sitemaps = sitemap_candidates(wave_rules, scheduled).select(
            "url", host_of(F.col("url")).alias("host"), F.lit(0).alias("depth")
        )
        redirect_cands = redirects.withColumn("host", host_of(F.col("url")))

        next_frontier = (
            extracted_with_depth.select("url", "host", "depth")
            .unionByName(redirect_cands.select("url", "host", "depth"))
            .unionByName(sitemaps.select("url", "host", "depth"))
            .withColumn("nature", classify_nature(F.col("url")))
            .withColumn("round_added", F.lit(r + 1))
            .select(*CANDIDATE_COLS)
            # politeness-deferred rows carry over ONLY when never-seen:
            # a was_seen deferred row sits in url_seen, stays due (its
            # last_controlled did not move), and the merge-on-read
            # recrawl scan re-derives it next round — writing it here
            # too would emit every backlogged recrawl row twice per
            # round (frontier write + scan), the dominant redundant
            # volume of recrawl-heavy steady state.
            .unionByName(
                deferred.filter(~F.col("was_seen")).select(*CANDIDATE_COLS)
            )
        )

        # ----- state updates (A1 MERGE upsert)
        backoff_needed = (
            F.col("status").isin(301, 302, 304, 307, 308)
            | (F.col("status") >= 400)
            | F.col("unchanged")
            | ((F.col("status") == 200) & ~F.col("unchanged") & ~fmt_ok)
        )
        seen_updates = fetched.select(
            "url",
            "host",
            scheme_of(F.col("url")).alias("scheme"),
            "depth",
            F.col("score"),
            F.lit(now).alias("last_visited"),
            F.lit(now).alias("last_controlled"),
            # a successfully-parsed .torrent also records its content sha
            # even though nothing is "saved": the F7 short-circuit then
            # suppresses re-parsing (and re-queueing) on recrawl while
            # the metainfo is unchanged
            F.when(F.col("saved") | F.col("magnet").isNotNull(), F.col("content_sha224"))
            .otherwise(F.col("last_hash"))
            .alias("last_hash"),
            # greatest(1, ...): a completed session-fetch must clear the
            # refresh_rate=0 retry marker set at deferral time, or the
            # recrawl scan would re-emit the URL every round forever
            F.when(backoff_needed, bump_refresh_rate(F.col("refresh_rate")))
            .otherwise(F.greatest(F.lit(1), F.col("refresh_rate")))
            .cast("int")
            .alias("refresh_rate"),
            "nature",
            F.col("round_added"),
        ).unionByName(
            # robots-blocked URLs back off to MAX (effectively never
            # retried); auth-deferred URLs on LOGINABLE hosts get
            # refresh_rate=0 — the merge-on-read recrawl scan then
            # re-emits them automatically next round, when the login
            # session established this round is live (the deferred-stream
            # consumption the r02 verdict asked for).  Credential-less
            # hosts AND hosts whose login form cannot be filled back off
            # to MAX like robots blocks.
            robots_blocked.withColumn("_rr", F.lit(MAX_REFRESH_RATE))
            .unionByName(
                auth_deferred.join(
                    F.broadcast(
                        self.loginable.select("host").withColumn("_hc", F.lit(True))
                    ),
                    "host",
                    "left",
                ).withColumn(
                    "_rr",
                    F.when(F.col("_hc"), F.lit(0)).otherwise(
                        F.lit(MAX_REFRESH_RATE)
                    ),
                ).drop("_hc")
            )
            .select(
                "url",
                "host",
                scheme_of(F.col("url")).alias("scheme"),
                "depth",
                F.lit(0.0).alias("score"),
                F.lit(None).cast("timestamp").alias("last_visited"),
                F.lit(now).alias("last_controlled"),
                F.col("last_hash"),
                F.col("_rr").alias("refresh_rate"),
                "nature",
                F.col("round_added"),
            )
        ).unionByName(
            # queued magnet tasks MERGE into url_seen keyed on the full
            # magnet URI (info-hash identity): the same torrent is never
            # re-queued while its metainfo is unchanged.  host = winning
            # parent's (magnet URIs have no authority); refresh_rate=MAX —
            # no transmission daemon in-sandbox ever completes them (S6
            # stub), and the F2 nature gate keeps them unfetchable.
            torrent_queue.select(
                F.col("magnet").alias("url"),
                "host",
                F.lit("magnet").alias("scheme"),
                (F.col("depth") + 1).cast("int").alias("depth"),
                F.lit(0.0).alias("score"),
                F.lit(None).cast("timestamp").alias("last_visited"),
                F.lit(now).alias("last_controlled"),
                F.lit("").alias("last_hash"),
                F.lit(MAX_REFRESH_RATE).alias("refresh_rate"),
                F.lit("web_static_torrent").alias("nature"),
                F.lit(r + 1).alias("round_added"),
            )
        )
        seen_updates = _pin(seen_updates)  # consumed by merge_upsert, recrawl merged_state and bloom

        # host PageRank proxy: inbound links observed this round.  In the
        # delta-log layout (A3 at scale) these per-host increments are the
        # ONLY rows written for host_stats on a normal round; the full
        # cumulative view exists lazily as the chain-sum reconstruction
        # and is materialized only on compaction rounds (merged_stats).
        inlink_delta = extracted_with_depth.groupBy("host").agg(
            F.count("*").cast("long").alias("inlinks")
        )
        merged_stats = (
            host_stats_raw.drop("bucket")
            .withColumnRenamed("inlinks", "_old")
            .join(inlink_delta.withColumnRenamed("inlinks", "_new"), "host", "full")
            .select(
                "host",
                (
                    F.coalesce(F.col("_old"), F.lit(0))
                    + F.coalesce(F.col("_new"), F.lit(0))
                ).cast("long").alias("inlinks"),
            )
        )

        seen_cols = [f.name for f in URL_SEEN_SCHEMA.fields]
        # ----- MERGE layout decisions.
        # A legacy (pre-bucketing) url_seen version has flat files and no
        # bucket partition column; nothing could be hard-linked from it, so
        # the whole state must be treated as dirty for one migration round.
        legacy_layout = "bucket" not in url_seen.columns
        cur_seen = (
            url_seen
            if not legacy_layout  # stored partition col -> pruning
            else url_seen.withColumn("bucket", bucket_of(F.col("host")))
        )
        # Delta-log MERGE (Iceberg merge-on-read analogue): a normal round
        # appends ONLY this round's update rows as a new delta version —
        # per-round write cost tracks |updates|, not |dirty buckets| —
        # and the read side reconstructs last-writer-wins per url
        # (state.py _read_chain).  Every state_delta_max_chain rounds the
        # chain is compacted back to a single bucketed base so read
        # amplification stays bounded.  Broad waves that dirty every
        # bucket (the r02 scale-killer: bucketed MERGE degraded to a full
        # rewrite) now cost O(|wave|) on all but the compaction round.
        chain = self.store.delta_chain("url_seen")
        base_v = self.store.current_version("url_seen")
        cur_chain = chain if chain else ([base_v] if base_v >= 0 else [])
        delta_on = cfg.state_delta_max_chain > 0 and not legacy_layout
        full_rewrite = legacy_layout or (
            delta_on and len(cur_chain) >= cfg.state_delta_max_chain
        )
        will_delta = delta_on and not full_rewrite and len(cur_chain) >= 1

        upd = seen_updates.withColumn("bucket", bucket_of(F.col("host")))
        def _timed(fn):
            if not _timing:
                return fn

            def wrap():
                t0 = time.monotonic()
                try:
                    return fn()
                finally:
                    _phases[f"w_{fn.__name__}"] = round(time.monotonic() - t0, 2)

            wrap.__name__ = fn.__name__
            return wrap

        # ----- robots_cache persist (early).
        # Delta-log bookkeeping mirroring url_seen's (A1): a normal round
        # APPENDS only this round's re-fetched rule sets — write cost
        # O(|refreshed hosts|), one small job — and the read side keeps a
        # host's NEWEST rule set (state.py group_last); the chain
        # compacts to one bucketed base every state_delta_max_chain
        # rounds.  This replaced the per-round read-dirty-buckets +
        # anti-join + rewrite job, the largest fixed item of the r4
        # serial write tail (w__robots_cache 8-57 s at local[1]).
        rc_chain = self.store.delta_chain("robots_cache")
        rc_base_v = self.store.current_version("robots_cache")
        rc_cur_chain = rc_chain if rc_chain else ([rc_base_v] if rc_base_v >= 0 else [])
        rc_delta_on = cfg.state_delta_max_chain > 0 and rc_has_bucket
        rc_will_delta = (
            rc_delta_on
            and len(rc_cur_chain) >= 1
            and len(rc_cur_chain) < cfg.state_delta_max_chain
        )

        def _robots_cache():
            """Returns (version, chain) for the manifest commit."""
            if rc_has_bucket and refreshed.isEmpty():
                # nothing refreshed this round: the committed version is
                # already current — no write job at all
                return rc_base_v, rc_cur_chain
            if rc_will_delta:
                # unpartitioned + coalesce(1): a delta holds only this
                # round's re-fetched rule sets (tiny), so one file beats
                # ~|buckets| one-row dir files; the bucket-pruned
                # PartitionFilter path stays on the BASE member, which is
                # the only O(|hosts|)-sized thing the wave slice reads
                delta = refreshed.withColumn("bucket", bucket_of(F.col("host")))
                v = self.store.write_version_delta(
                    "robots_cache", delta.coalesce(1), partitioned=False
                )
                return v, rc_cur_chain + [v]
            if rc_delta_on or not rc_has_bucket:
                # compaction round / legacy flat-layout migration: one
                # full bucketed rewrite of the merged view
                # (robots_cache_raw IS the chain reconstruction when a
                # chain exists)
                full = (
                    robots_cache_raw.drop("bucket")
                    .join(
                        F.broadcast(refreshed.select("host").distinct()),
                        "host",
                        "left_anti",
                    )
                    .unionByName(refreshed)
                    .withColumn("bucket", bucket_of(F.col("host")))
                )
                v = self.store.write_version_bucketed(
                    "robots_cache",
                    full.repartition(
                        max(1, min(cfg.num_partitions, n_buckets)), "bucket"
                    ),
                    [],
                    link_clean=False,
                )
                return v, [v]
            # delta layout disabled (state_delta_max_chain=0, the r02
            # layout): dirty-bucket incremental rewrite, clean buckets
            # hard-linked — the pre-r5 path, kept for that config
            dirty = sorted(
                int(x["b"])
                for x in refreshed.select(bucket_of(F.col("host")).alias("b"))
                .distinct()
                .collect()
            )
            old_dirty = robots_cache_raw.filter(
                F.col("bucket").isin(dirty) if dirty else F.lit(False)
            ).drop("bucket")
            new_dirty = (
                old_dirty.join(
                    F.broadcast(refreshed.select("host").distinct()),
                    "host",
                    "left_anti",
                )
                .unionByName(refreshed)
                .withColumn("bucket", bucket_of(F.col("host")))
            )
            n_write = max(1, min(cfg.num_partitions, len(dirty) or 1))
            v = self.store.write_version_bucketed(
                "robots_cache", new_dirty.repartition(n_write, "bucket"), dirty
            )
            return v, [v]

        def _sessions():
            # tiny per-host table (only auth-gated hosts ever get rows);
            # when no URL deferred this round no new session can exist —
            # reuse the committed version, skip the job entirely
            if auth_deferred.isEmpty():
                return self.store.current_version("auth_sessions")
            return self.store.write_version("auth_sessions", sessions_next)

        # Materialize the round's heavy shared parent ONCE (the fetch
        # join + status/extraction projection), then overlap its
        # independent consumers in threads: the dirty-bucket collect
        # (which also materializes the seen_updates pin every persist job
        # reuses), the exploded resolve+canonicalize extraction pin
        # (the round's regex-heaviest projection, needed by the fan-out's
        # _frontier and _stats jobs), and the two early persists —
        # robots_cache and auth_sessions read only pins the fetch job
        # already materialized (refreshed, gated), so they overlap the
        # extraction materialize instead of serializing after it in the
        # write tail.  Sequencing fetched first matters: two concurrent
        # jobs racing to compute a not-yet-materialized pin would each
        # schedule the full fetch join.
        fetched.count()
        _mark("fetched_materialize")
        pool = ThreadPoolExecutor(max_workers=8)
        try:
            f_rv = pool.submit(_timed(_robots_cache))
            f_sv = pool.submit(_timed(_sessions))
            _f_dirty = pool.submit(
                lambda: sorted(
                    int(x["bucket"])
                    for x in upd.select("bucket").distinct().collect()
                )
            )
            _f_ex = pool.submit(extracted_with_depth.count)
            dirty_buckets = _f_dirty.result()
            _f_ex.result()
        except BaseException:
            pool.shutdown(wait=False, cancel_futures=True)
            raise
        _mark("seen_updates_and_extract_materialize")
        if will_delta:
            merged_dirty = None  # nothing to merge at write time
        else:
            if full_rewrite:
                is_dirty = F.lit(True)
            elif dirty_buckets:
                is_dirty = F.col("bucket").isin(dirty_buckets)
            else:
                is_dirty = F.lit(False)
            # url alone is the key (primary key of url_seen; host is
            # derived from it) — a single plain-equality key lets the
            # state side reuse the reconstruction's hash(url)
            # partitioning on compaction rounds (see dedup.py).
            upd_keys = seen_updates.select(F.col("url").alias("u_url"))
            merged_dirty = _pin(
                cur_seen.filter(is_dirty)
                .join(upd_keys, F.col("url") == F.col("u_url"), "left_anti")
                .select(*seen_cols, "bucket")
                .unionByName(upd.select(*seen_cols, "bucket"))
            )

        # Dedupe before writing: extraction emits the same URL from many
        # parents (3-4x write amplification otherwise).  The dedupe keys
        # on the uniform (url, host) hash — safe under the zipf-heavy
        # target-host skew of the raw extracted stream — and the written
        # frontier stays in that uniform layout: the next round starts
        # with its own routing repartition by host, so a host-grouping
        # shuffle here would move the round's largest intermediate a
        # second time for a layout nothing consumes.  Recrawl rows are
        # NOT written here — they are derived from url_seen at the next
        # round's read (merge-on-read recrawl, see top of round).
        next_frontier = _pin(
            dedupe_within_batch(next_frontier.select(*CANDIDATE_COLS))
            .select(*CANDIDATE_COLS)
        )

        # ----- lineage / metrics (A3/A4/A6) per host-shard.
        # Round totals (scheduled/fetched/blocked) are summed from this
        # per-partition lineage table after the persist fan-out instead of
        # running separate count() jobs over the same cached data.
        # One tagged union + ONE hash aggregate instead of four groupBys
        # stitched by three full-outer joins: the per-partition counters
        # all key on the same shard id, so a single shuffle suffices.
        wall_ms = int((time.monotonic() - t_start) * 1000)
        snapshot = json.dumps(self.store.manifest()["tables"], sort_keys=True)

        def _tagged(df, tag):
            return df.select(
                shard(F.col("host")).alias("partition_id"), F.lit(tag).alias("_k")
            )

        tally = lambda tag: F.sum(
            F.when(F.col("_k") == tag, 1).otherwise(0)
        )
        lineage = (
            _tagged(candidates, "in")
            .unionByName(_tagged(scheduled, "sched"))
            .unionByName(_tagged(fetched, "fetch"))
            .unionByName(_tagged(robots_blocked, "blocked"))
            .groupBy("partition_id")
            .agg(
                tally("in").alias("urls_in"),
                tally("sched").alias("urls_scheduled"),
                tally("fetch").alias("urls_fetched"),
                tally("blocked").alias("urls_robots_blocked"),
            )
            .select(
                F.lit(r).alias("round"),
                F.col("partition_id").cast("int"),
                F.col("urls_in"),
                (F.col("urls_in") - F.col("urls_scheduled")).alias("urls_deduped"),
                F.col("urls_scheduled"),
                F.col("urls_fetched"),
                F.col("urls_robots_blocked"),
                F.lit(wall_ms).alias("wall_ms"),
                F.lit(snapshot).alias("input_snapshot"),
            )
        )
        lineage = _pin(lineage)

        # ----- persist + atomic commit.
        # The persists are data-independent (they share only cached
        # parents), so they run as concurrent Spark jobs from driver
        # threads — the per-job driver overhead overlaps instead of
        # serializing.  robots_cache and auth_sessions were submitted
        # earlier (overlapping the extraction materialize); the rest
        # join the same pool here.  Nothing is visible until the
        # manifest commit.
        def _crawl_log():
            self.store.append_round("crawl_log", crawl_log, r)

        def _lineage():
            self.store.append_round("lineage_metrics", lineage, r)

        def _merge():
            if will_delta:
                # delta append: write ONLY this round's updates,
                # UNPARTITIONED (bucket stays a plain column) and in the
                # pin's existing wave partitioning.  url_seen reads are
                # always full reconstructions (validate join + recrawl
                # scan touch every bucket), so bucket=N dirs buy no
                # pruning here and a 256-bucket wave would shatter each
                # delta into ~256 tiny files (the r5 state_reads
                # profile's dominant term); skipping the repartition
                # also drops a per-round O(|wave|) shuffle.
                return self.store.write_version_delta(
                    "url_seen", upd, partitioned=False
                )
            # bucketed rewrite: dirty buckets written, clean buckets
            # hard-linked — except on compaction/migration rounds, where
            # the current version dir is a partial delta (or flat legacy)
            # and nothing may be linked from it.
            n_write = (
                cfg.num_partitions
                if full_rewrite
                else max(1, min(cfg.num_partitions, len(dirty_buckets)))
            )
            df = merged_dirty.repartition(n_write, "bucket")
            return self.store.write_version_bucketed(
                "url_seen", df, dirty_buckets, link_clean=not full_rewrite
            )

        # host_stats delta-chain bookkeeping (mirrors url_seen's): a
        # normal round APPENDS only this round's inlink increments; every
        # state_delta_max_chain rounds (or on legacy-layout migration) the
        # chain-sum reconstruction is compacted to one bucketed base.
        hs_chain = self.store.delta_chain("host_stats")
        hs_base_v = self.store.current_version("host_stats")
        hs_cur_chain = hs_chain if hs_chain else ([hs_base_v] if hs_base_v >= 0 else [])
        hs_delta_on = cfg.state_delta_max_chain > 0 and hs_has_bucket
        hs_will_delta = (
            hs_delta_on
            and len(hs_cur_chain) >= 1
            and len(hs_cur_chain) < cfg.state_delta_max_chain
        )

        def _stats():
            if hs_will_delta:
                # unpartitioned delta (bucket stays a column): a delta is
                # O(|wave hosts|) rows, so shattering it into bucket=N
                # one-row dir files costs more to re-open than it saves;
                # wave-sliced reads keep PartitionFilter pruning on the
                # bucketed BASE (the O(|hosts|) member) and filter the
                # small deltas by column stats.  coalesce, not
                # repartition: no shuffle, just fewer output files.
                delta = inlink_delta.withColumn("bucket", bucket_of(F.col("host")))
                return self.store.write_version_delta(
                    "host_stats",
                    delta.coalesce(max(1, cfg.num_partitions // 4)),
                    partitioned=False,
                )
            # compaction or legacy migration: one full bucketed rewrite of
            # the cumulative view — the only round that touches all hosts
            full = merged_stats.withColumn("bucket", bucket_of(F.col("host")))
            return self.store.write_version_bucketed(
                "host_stats",
                full.repartition(max(1, min(cfg.num_partitions, n_buckets)), "bucket"),
                [],
                link_clean=False,
            )

        def _frontier():
            return self.store.write_version("frontier", next_frontier)

        def _bloom():
            # incremental bloom update with this round's newly-seen URLs:
            # OR-merge + write happen INSIDE the executor task per shard
            # (operators/bloom.py update_and_save_shards); the driver only
            # links untouched shards — no S*m/8 array in driver memory.
            from ..operators.bloom import update_and_save_shards

            cur_bv = self.store.current_version("bloom")
            prev = self._bloom_path(cur_bv)
            legacy_npz = prev + ".npz"
            if cur_bv >= 0 and os.path.exists(legacy_npz):
                # pre-r2 single-file state: one driver-side migration
                # round rewrites it in the per-shard dir format
                dirty_shards = self.bloom.update_from_df(
                    seen_updates.select("url", "host")
                )
                self.bloom.save_dir(self._bloom_path(cur_bv + 1))
                self._bloom = None
                return cur_bv + 1
            if cur_bv >= 0 and os.path.isdir(prev):
                meta = BloomShards.dir_meta(prev)
                S_, m_, k_ = meta["num_shards"], meta["m"], meta["k"]
                prev_dir = prev
            else:
                S_, m_, k_ = cfg.bloom_shards, cfg.bloom_bits_per_shard, 7
                prev_dir = None
            update_and_save_shards(
                seen_updates.select("url", "host"),
                self._bloom_path(cur_bv + 1),
                prev_dir,
                S_,
                m_,
                k_,
            )
            # invalidate the lazily-loaded driver copy (broadcast-probe
            # path reloads the new version's shard files next round)
            self._bloom = None
            return cur_bv + 1

        try:
            f_log = pool.submit(_timed(_crawl_log))
            f_lin = pool.submit(_timed(_lineage))
            f_uv = pool.submit(_timed(_merge))
            f_hv = pool.submit(_timed(_stats))
            f_fv = pool.submit(_timed(_frontier))
            f_bv = pool.submit(_timed(_bloom))
            f_log.result()
            f_lin.result()
            uv, hv, fv, bv, sv = (
                f_uv.result(), f_hv.result(), f_fv.result(), f_bv.result(),
                f_sv.result(),
            )
            rv, rc_new_chain = f_rv.result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
        _mark('persist_fanout')
        self.store.commit(
            r,
            {"url_seen": uv, "host_stats": hv, "frontier": fv, "bloom": bv,
             "robots_cache": rv, "auth_sessions": sv},
            meta={"state_buckets": n_buckets},
            delta_chains={
                "url_seen": (cur_chain + [uv]) if will_delta else [uv],
                "host_stats": (hs_cur_chain + [hv]) if hs_will_delta else [hv],
                "robots_cache": rc_new_chain,
            },
        )
        # GC: superseded versions are unreachable once the manifest moved on;
        # keep one prior snapshot for post-hoc inspection (Iceberg's
        # expire_snapshots analogue)
        self.store.vacuum(keep_last=2)
        _mark('commit_vacuum')

        totals = lineage.groupBy().agg(
            F.sum("urls_scheduled").alias("s"),
            F.sum("urls_fetched").alias("f"),
            F.sum("urls_robots_blocked").alias("b"),
        ).collect()[0]
        n_sched, n_fetched, n_blocked = int(totals["s"] or 0), int(totals["f"] or 0), int(totals["b"] or 0)
        n_next = None if cfg.light_stats else next_frontier.count()
        _mark('n_next_count')
        for df in (
            candidates,
            gated,
            ranked,
            fetched,
            extracted_with_depth,
            seen_updates,
            next_frontier,
            merged_dirty,
            url_seen_pre,
            cand_hosts,
            cache_slice,
            src_rules,
            refreshed,
            wave_rules,
            lineage,
        ):
            if df is not None:
                df.unpersist()
        # every plan referencing this round's bloom broadcast has
        # materialized (the persist fan-out is complete), so the handle
        # can be destroyed — otherwise each round leaks one bitset copy
        while self._round_bcs:
            self._round_bcs.pop().destroy()
        _mark('unpersist')
        if _timing:
            print(f"ROUND_TIMING r={r} " + json.dumps(_phases))
        # return contract: under cfg.light_stats the info-only counters
        # "candidates"/"new_candidates" are None (not 0, not a sentinel
        # int) — consumers aggregating per-round counts must skip None.
        return {
            "round": r,
            "candidates": n_in,
            "scheduled": n_sched,
            "robots_blocked": n_blocked,
            "fetched": n_fetched,
            "new_candidates": n_next,
            "wall_ms": wall_ms,
        }

    def _commit_empty(self, r: int, t_start: float) -> None:
        empty_log = self.spark.createDataFrame([], S.CRAWL_LOG_SCHEMA)
        self.store.append_round("crawl_log", empty_log, r)
        self.store.append_round(
            "lineage_metrics", self.spark.createDataFrame([], S.LINEAGE_METRICS_SCHEMA), r
        )
        fv = self.store.write_version(
            "frontier", self.spark.createDataFrame([], CANDIDATES_SCHEMA)
        )
        self.store.commit(r, {"frontier": fv})

    def run(self, n_rounds: int) -> list[dict]:
        """Run up to n_rounds, resuming from the last committed round."""
        self.bootstrap()
        out = []
        for _ in range(n_rounds):
            t0 = time.monotonic()
            stats = self.run_round()
            stats["round_wall_ms"] = int((time.monotonic() - t0) * 1000)
            out.append(stats)
            if stats.get("candidates", 0) == 0 and stats.get("new_candidates", 0) == 0:
                break
        return out
