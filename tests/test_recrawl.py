"""A2 recrawl scheduler (Master.py:330-342): with revisit_delay=1 the
engine re-validates stale URLs, exercises the unchanged-content
short-circuit (F7) and refresh-rate backoff (T7), and must still match
the pure-Python model exactly."""

import pytest

from artemis_spark.model import ModelConfig, ReferenceModel
from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

N_ROUNDS = 5
BUDGET = 6


@pytest.fixture(scope="module")
def runs(spark, tiny_web, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("state_recrawl"))
    eng = CrawlEngine(
        spark,
        tiny_web,
        state,
        CrawlConfig(
            politeness_budget=BUDGET,
            revisit_delay_rounds=1,
            num_partitions=4,
            bloom_shards=8,
        ),
    )
    eng_stats = eng.run(N_ROUNDS)
    model = ReferenceModel(
        tiny_web, ModelConfig(politeness_budget=BUDGET, revisit_delay_rounds=1)
    )
    model_result = model.run(N_ROUNDS)
    return eng, eng_stats, model_result


def test_recrawl_fetch_sets_match(runs):
    eng, _, result = runs
    log = [r.asDict() for r in eng.store.read_appended("crawl_log").collect()]
    for r in range(N_ROUNDS):
        eng_urls = sorted(
            x["url"]
            for x in log
            if x["round"] == r and x["status"] not in (997, 998, 999)
        )
        mod_urls = sorted(result["rounds"][r]) if r < len(result["rounds"]) else []
        assert eng_urls == mod_urls, f"round {r}"


def test_recrawl_happens(runs):
    eng, _, result = runs
    log = [r.asDict() for r in eng.store.read_appended("crawl_log").collect()]
    from collections import Counter

    counts = Counter(x["url"] for x in log if x["status"] not in (997, 998, 999))
    assert max(counts.values()) >= 2, "no URL was ever recrawled with delay=1"


def test_backoff_state_matches(runs):
    eng, _, result = runs
    seen = {
        r["url"]: (r["refresh_rate"], r["last_hash"])
        for r in eng.store.read("url_seen").collect()
    }
    mod = {
        u: (e["refresh_rate"], e["last_hash"])
        for u, e in result["url_seen"].items()
    }
    assert seen == mod
    assert any(rr > 1 for rr, _ in seen.values()), "backoff never incremented"
