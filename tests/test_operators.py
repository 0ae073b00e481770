"""Operator unit tests: robots longest-match + TTL, politeness window,
dedup/backoff, state store merge + crash-resume semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from artemis_spark.operators.dedup import bump_refresh_rate, dedupe_within_batch
from artemis_spark.operators.politeness import politeness_topk, with_score
from artemis_spark.operators.robots import apply_robots, sitemap_candidates
from artemis_spark.schemas import URL_SEEN_SCHEMA
from artemis_spark.sources.state import StateStore

T0 = dt.datetime(2026, 1, 1)


def _rules(spark, rows):
    return spark.createDataFrame(
        rows,
        "host string, pattern string, allow boolean, sitemap_url string, "
        "fetched_at timestamp, ttl_s long",
    )


def _wave(spark, urls):
    return spark.createDataFrame(
        [(u, u.split("://")[1].split("/")[0]) for u in urls], "url string, host string"
    )


class TestRobots:
    def test_longest_match_wins(self, spark):
        rules = _rules(
            spark,
            [
                ("h.test", "/p1", False, None, T0, 3600),
                ("h.test", "/p12", True, None, T0, 3600),
            ],
        )
        wave = _wave(
            spark, ["http://h.test/p1", "http://h.test/p12", "http://h.test/p2"]
        )
        allowed, blocked = apply_robots(wave, rules, T0)
        assert {r["url"] for r in allowed.collect()} == {
            "http://h.test/p12",
            "http://h.test/p2",  # no matching rule -> allowed
        }
        assert {r["url"] for r in blocked.collect()} == {"http://h.test/p1"}

    def test_ttl_expiry_ignores_stale_rules(self, spark):
        rules = _rules(spark, [("h.test", "/", False, None, T0, 3600)])
        wave = _wave(spark, ["http://h.test/x"])
        # within TTL: blocked
        _, blocked = apply_robots(wave, rules, T0 + dt.timedelta(seconds=3599))
        assert blocked.count() == 1
        # past TTL: rule ignored (a live system would re-fetch, Robot.py:91-98)
        allowed, _ = apply_robots(wave, rules, T0 + dt.timedelta(seconds=7200))
        assert allowed.count() == 1

    def test_sitemap_side_emit_only_touched_hosts(self, spark):
        rules = _rules(
            spark,
            [
                ("a.test", "/", True, "http://a.test/sitemap.xml", T0, 3600),
                ("b.test", "/", True, "http://b.test/sitemap.xml", T0, 3600),
            ],
        )
        wave = _wave(spark, ["http://a.test/x"])
        got = {r["url"] for r in sitemap_candidates(rules, wave).collect()}
        assert got == {"http://a.test/sitemap.xml"}


class TestPoliteness:
    def test_topk_and_deferral(self, spark):
        rows = [
            ("http://h.test/a", "h.test", 0),
            ("http://h.test/b", "h.test", 0),
            ("http://h.test/c", "h.test", 1),
            ("http://i.test/z", "i.test", 5),
        ]
        df = spark.createDataFrame(rows, "url string, host string, depth int")
        stats = spark.createDataFrame([("h.test", 10)], "host string, inlinks long")
        scored = with_score(df, stats)
        scheduled, deferred = politeness_topk(scored, budget=2)
        s = {r["url"] for r in scheduled.collect()}
        d = {r["url"] for r in deferred.collect()}
        # depth 0 beats depth 1; tie broken by url asc
        assert s == {"http://h.test/a", "http://h.test/b", "http://i.test/z"}
        assert d == {"http://h.test/c"}

    def test_score_integer_valued(self, spark):
        df = spark.createDataFrame(
            [("u", "h.test", 3)], "url string, host string, depth int"
        )
        stats = spark.createDataFrame([("h.test", 2000)], "host string, inlinks long")
        row = with_score(df, stats).collect()[0]
        assert row["score"] == -3000.0 + 999.0  # inlinks capped at 999


class TestDedup:
    def test_within_batch_keeps_min(self, spark):
        df = spark.createDataFrame(
            [
                ("u", "h", 3, "web_static", 2),
                ("u", "h", 1, "web_static", 4),
            ],
            "url string, host string, depth int, nature string, round_added int",
        )
        row = dedupe_within_batch(df).collect()[0]
        assert (row["depth"], row["round_added"]) == (1, 2)

    def test_backoff_capped_at_20(self, spark):
        df = spark.createDataFrame([(19,), (20,)], "r int")
        got = [r["b"] for r in df.select(bump_refresh_rate(F.col("r")).alias("b")).collect()]
        assert got == [20, 20]


class TestStateStore:
    def test_merge_upsert_replaces_by_key(self, spark, tmp_path):
        store = StateStore(spark, str(tmp_path))
        base = spark.createDataFrame(
            [("u1", "h", "http", 0, 0.0, None, None, "", 1, "web_static", 0)],
            URL_SEEN_SCHEMA,
        )
        v0 = store.write_version("url_seen", base)
        store.commit(0, {"url_seen": v0})
        upd = spark.createDataFrame(
            [
                ("u1", "h", "http", 0, 0.0, None, None, "NEW", 5, "web_static", 1),
                ("u2", "h", "http", 1, 0.0, None, None, "", 1, "web_static", 1),
            ],
            URL_SEEN_SCHEMA,
        )
        v1 = store.merge_upsert("url_seen", upd, "url", URL_SEEN_SCHEMA)
        store.commit(1, {"url_seen": v1})
        rows = {r["url"]: r for r in store.read("url_seen").collect()}
        assert rows["u1"]["last_hash"] == "NEW" and rows["u1"]["refresh_rate"] == 5
        assert set(rows) == {"u1", "u2"}

    def test_uncommitted_version_invisible(self, spark, tmp_path):
        store = StateStore(spark, str(tmp_path))
        df = spark.createDataFrame([("x",)], "a string")
        store.write_version("t", df)  # no commit -> crash before manifest swap
        assert store.read("t") is None
        assert store.last_round() == -1

    def test_crashed_version_dir_is_overwritten(self, spark, tmp_path):
        store = StateStore(spark, str(tmp_path))
        df1 = spark.createDataFrame([("stale",)], "a string")
        store.write_version("t", df1)  # v0 written, never committed
        df2 = spark.createDataFrame([("fresh",)], "a string")
        v = store.write_version("t", df2)  # re-run writes v0 again
        store.commit(0, {"t": v})
        assert [r["a"] for r in store.read("t").collect()] == ["fresh"]
