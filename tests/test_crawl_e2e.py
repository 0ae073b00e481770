"""Golden end-to-end: the Spark engine must reproduce the pure-Python
reference model's crawl order, crawl log and final URL-seen set on the
deterministic tiny synthetic web (SURVEY.md §5 item 2; north_rule
"matching the reference's crawl ordering and URL-seen set under the
same seed list + politeness budget")."""

import pytest

from artemis_spark.model import ModelConfig, ReferenceModel
from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

N_ROUNDS = 4
BUDGET = 5


@pytest.fixture(scope="module")
def engine_run(spark, tiny_web, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("state"))
    eng = CrawlEngine(
        spark,
        tiny_web,
        state,
        CrawlConfig(politeness_budget=BUDGET, num_partitions=4, bloom_shards=8),
    )
    stats = eng.run(N_ROUNDS)
    return eng, stats


@pytest.fixture(scope="module")
def model_run(tiny_web):
    m = ReferenceModel(tiny_web, ModelConfig(politeness_budget=BUDGET))
    return m, m.run(N_ROUNDS)


def _engine_log(eng):
    df = eng.store.read_appended("crawl_log")
    return [r.asDict() for r in df.collect()]


def test_rounds_progress(engine_run):
    _, stats = engine_run
    assert len(stats) == N_ROUNDS
    assert stats[0]["scheduled"] > 0
    assert stats[1]["scheduled"] > 0


def test_crawl_order_matches_model(engine_run, model_run):
    eng, _ = engine_run
    model, result = model_run
    log = _engine_log(eng)
    for r in range(N_ROUNDS):
        eng_urls = sorted(
            row["url"]
            for row in log
            if row["round"] == r and row["status"] not in (997, 998, 999)
        )
        mod_urls = sorted(result["rounds"][r]) if r < len(result["rounds"]) else []
        assert eng_urls == mod_urls, f"round {r} fetch set diverged"


def test_crawl_log_rows_match_model(engine_run, model_run):
    eng, _ = engine_run
    model, result = model_run
    key = lambda d: (d["round"], d["url"])
    eng_rows = {
        key(r): (r["status"], r["image_id"], r["phash"], r["caption"], r["auth"])
        for r in _engine_log(eng)
    }
    mod_rows = {
        key(r): (r["status"], r["image_id"], r["phash"], r["caption"], r["auth"])
        for r in result["crawl_log"]
    }
    assert eng_rows == mod_rows


def test_final_url_seen_matches_model(engine_run, model_run):
    eng, _ = engine_run
    model, result = model_run
    seen_df = eng.store.read("url_seen")
    eng_seen = {
        r["url"]: (r["last_hash"], r["refresh_rate"], r["depth"])
        for r in seen_df.collect()
    }
    mod_seen = {
        u: (e["last_hash"], e["refresh_rate"], e["depth"])
        for u, e in result["url_seen"].items()
    }
    assert eng_seen == mod_seen


def test_lineage_metrics_written(engine_run):
    eng, _ = engine_run
    lm = eng.store.read_appended("lineage_metrics")
    rows = lm.collect()
    assert len(rows) > 0
    assert all(r["urls_scheduled"] <= r["urls_in"] for r in rows)
    by_round = {}
    for r in rows:
        by_round[r["round"]] = by_round.get(r["round"], 0) + r["urls_fetched"]
    assert by_round[0] > 0


def test_payload_validation_all_ok(engine_run):
    """input_hint: decoded phash + dims must equal the fixture metadata
    for every saved payload (PSNR/allclose equivalence is asserted
    per-codec in test_images.py)."""
    eng, _ = engine_run
    log = eng.store.read_appended("crawl_log")
    saved = log.filter(log["image_id"].isNotNull()).collect()
    assert len(saved) > 0
    assert all(r["payload_ok"] for r in saved)


def test_torrent_magnets_queued(engine_run, model_run):
    """S6 in-round wiring: the tiny web seeds one ``.torrent`` URL; its
    fetched payload must be bencode-parsed into a magnet task, logged
    with the handler-queue marker (997) and MERGEd into url_seen keyed
    by the full magnet URI (info-hash identity — Task.buildFromFile,
    /root/reference/src/Task.py:47-59).  Row-level equality with the
    model is covered by test_crawl_log_rows_match_model; this asserts
    the torrent-specific invariants directly."""
    eng, _ = engine_run
    _, result = model_run
    queued = [r for r in _engine_log(eng) if r["status"] == 997]
    assert queued, "no magnet task was queued from the seeded .torrent"
    assert all(r["url"].startswith("magnet:?xt=urn:btih:") for r in queued)
    # one queue row per info-hash: unchanged .torrent content must not
    # re-queue on recrawl (F7 short-circuit)
    assert len({r["url"] for r in queued}) == len(queued)
    seen_df = eng.store.read("url_seen")
    magnets = {
        r["url"]: r for r in seen_df.collect() if r["url"].startswith("magnet:")
    }
    assert set(magnets) == {r["url"] for r in queued}
    for row in magnets.values():
        assert row["nature"] == "web_static_torrent"


def test_resume_after_interrupt_equals_straight_run(spark, tmp_path, tiny_web):
    """North-rule resumability: stop after round k, build a NEW engine on
    the same state dir, continue — final url_seen and crawl_log equal an
    uninterrupted run over the same web."""
    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8)

    straight = CrawlEngine(spark, tiny_web, str(tmp_path / "s1"), cfg)
    straight.run(3)

    part1 = CrawlEngine(spark, tiny_web, str(tmp_path / "s2"), cfg)
    part1.run(2)
    resumed = CrawlEngine(spark, tiny_web, str(tmp_path / "s2"), cfg)  # fresh process stand-in
    resumed.run(1)

    def snap(eng):
        seen = {
            (r["url"], r["last_hash"], r["refresh_rate"])
            for r in eng.store.read("url_seen").collect()
        }
        log = {
            (r["round"], r["url"], r["status"], r["image_id"], r["phash"])
            for r in eng.store.read_appended("crawl_log").collect()
        }
        return seen, log

    assert snap(resumed) == snap(straight)


def test_crash_between_write_and_commit_is_recovered(spark, tmp_path, tiny_web):
    """A round that dies AFTER writing version dirs but BEFORE the
    manifest swap must leave the previous snapshot intact; the re-run
    overwrites the orphaned dirs and converges to the straight run."""
    from pyspark.sql import functions as F

    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8)

    straight = CrawlEngine(spark, tiny_web, str(tmp_path / "s1"), cfg)
    straight.run(3)

    crashed = CrawlEngine(spark, tiny_web, str(tmp_path / "s2"), cfg)
    crashed.run(2)
    # simulate the crash: orphaned next-version dirs exist, manifest does not
    # point at them (url_seen garbage + a leftover frontier dir)
    store = crashed.store
    garbage = store.read("frontier").limit(1).withColumn("bucket", F.lit(0))
    store.write_version_bucketed("url_seen", garbage, [0])
    store.write_version("frontier", store.read("frontier").limit(2))
    assert store.last_round() == 1  # snapshot still the completed round

    resumed = CrawlEngine(spark, tiny_web, str(tmp_path / "s2"), cfg)
    resumed.run(1)

    def snap(eng):
        seen = {
            (r["url"], r["last_hash"], r["refresh_rate"])
            for r in eng.store.read("url_seen").collect()
        }
        log = {
            (r["round"], r["url"], r["status"])
            for r in eng.store.read_appended("crawl_log").collect()
        }
        return seen, log

    assert snap(resumed) == snap(straight)


def test_markup_extraction_equals_outlink_join(spark, tmp_path, tiny_web):
    """T2/T3: extracting outlinks from the rendered page BYTES (markup
    grammar) must produce the identical crawl to the legacy
    link_graph.outlinks join — the rendered web is the same web."""
    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    markup = CrawlEngine(
        spark, tiny_web, str(tmp_path / "markup"),
        CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8,
                    extract_markup=True),
    )
    markup.run(3)
    legacy = CrawlEngine(
        spark, tiny_web, str(tmp_path / "legacy"),
        CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8,
                    extract_markup=False),
    )
    legacy.run(3)

    def log(eng):
        return {
            (r["round"], r["url"], r["status"], r["image_id"], r["phash"])
            for r in eng.store.read_appended("crawl_log").collect()
        }

    assert log(markup) == log(legacy)
    seen = lambda e: {
        (r["url"], r["last_hash"], r["refresh_rate"])
        for r in e.store.read("url_seen").collect()
    }
    assert seen(markup) == seen(legacy)


def test_shard_local_bloom_same_results(spark, tmp_path, tiny_web):
    """The shard-local bloom probe (scale path: no bitset broadcast) must
    leave every crawl output unchanged — it is a physical probe strategy
    only; exactness is guaranteed by the downstream anti-join either way."""
    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    base = CrawlEngine(
        spark, tiny_web, str(tmp_path / "bcast"),
        CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8),
    )
    base.run(3)
    local = CrawlEngine(
        spark, tiny_web, str(tmp_path / "shardlocal"),
        CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8,
                    bloom_shard_local=True),
    )
    local.run(3)

    def log(eng):
        return {
            (r["round"], r["url"], r["status"], r["image_id"], r["phash"])
            for r in eng.store.read_appended("crawl_log").collect()
        }

    assert log(local) == log(base)
    seen = lambda e: {
        (r["url"], r["last_hash"], r["refresh_rate"])
        for r in e.store.read("url_seen").collect()
    }
    assert seen(local) == seen(base)


def test_salted_fetch_wave_same_results(spark, tmp_path, tiny_web):
    """north_rule skew handling: running the round with fetch_salt > 0
    (salted host repartition of the wave) must not change any output —
    salting is a physical re-distribution only."""
    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    base = CrawlEngine(
        spark, tiny_web, str(tmp_path / "nosalt"),
        CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8),
    )
    base.run(2)
    salted = CrawlEngine(
        spark, tiny_web, str(tmp_path / "salt"),
        CrawlConfig(politeness_budget=5, num_partitions=4, bloom_shards=8, fetch_salt=3),
    )
    salted.run(2)

    def log(eng):
        return {
            (r["round"], r["url"], r["status"], r["image_id"], r["phash"])
            for r in eng.store.read_appended("crawl_log").collect()
        }

    assert log(salted) == log(base)
    seen = lambda e: {
        (r["url"], r["refresh_rate"]) for r in e.store.read("url_seen").collect()
    }
    assert seen(salted) == seen(base)
