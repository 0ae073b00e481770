"""Auth routing skeleton (reference accreditationRules,
/root/reference/src/Task.py:12,22-27,41): auth-gated hosts are
classified from the per-host rules table and routed to a deferred
stream — flagged in crawl_log, recorded in url_seen, never fetched."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artemis_spark.datagen import TIERS, gen_auth_rules  # noqa: E402
from artemis_spark.plans.crawl import (  # noqa: E402
    AUTH_DEFERRED_STATUS,
    CrawlConfig,
    CrawlEngine,
)


def test_auth_rules_deterministic():
    rules = gen_auth_rules(TIERS["small"])  # 64 hosts
    m = dict(zip(rules["host"], rules["auth"]))
    assert m["host0007.test"] == "form"  # 7 % 17 == 7
    assert m["host0011.test"] == "http_basic"  # 11 % 23 == 11
    assert "host0000.test" not in m  # defaultdict -> 'no'


def test_auth_hosts_deferred_not_fetched(spark, tmp_path, tiny_web):
    eng = CrawlEngine(
        spark, tiny_web, str(tmp_path / "state"),
        # high budget so host0007 (auth=form on the tiny tier) is reached
        CrawlConfig(politeness_budget=25, num_partitions=4, bloom_shards=8),
    )
    eng.run(4)
    log = eng.store.read_appended("crawl_log")
    h7 = log.filter(log["host"] == "host0007.test").collect()
    assert h7, "crawl never reached the auth-gated host"
    assert all(r["status"] == AUTH_DEFERRED_STATUS for r in h7)
    assert all(r["auth"] == "form" for r in h7)
    assert all(r["image_id"] is None for r in h7)

    # non-gated rows carry the marker too (auth='no')
    normal = log.filter(log["status"] == 200).limit(5).collect()
    assert normal and all(r["auth"] == "no" for r in normal)

    # deferred URLs are recorded in url_seen (crawl-once semantics) with
    # max backoff, exactly like robots-blocked URLs
    seen = eng.store.read("url_seen")
    h7_seen = seen.filter(seen["host"] == "host0007.test").collect()
    assert h7_seen and all(r["refresh_rate"] == 20 for r in h7_seen)
    assert all(r["last_visited"] is None for r in h7_seen)
