"""Guard the session factory's perf-critical defaults.

Each of these encodes a measured round-4 finding (BENCH.md round 4):
losing one to a refactor silently reintroduces a diagnosed stall, so
pin them here rather than trusting the comment next to the config.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_small_file_packing(spark):
    # openCostInBytes=64KB packs tiny delta-log files ~60-to-a-split;
    # the 4MB default made every bucket file its own scan task and
    # serialized low-core rigs (the local[2] 26% regression).
    assert int(spark.conf.get("spark.sql.files.openCostInBytes")) == 64 * 1024
    # maxPartitionBytes still governs large-file splitting.
    assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) == 4 * 1024 * 1024


def test_codegen_cache_holds_a_round(spark):
    # ~340 generated classes per crawl round vs the 100-entry Janino
    # default: cache thrash recompiled every later stage inside tasks
    # (13.2k -> 22.0k URLs/s when sized to hold full rounds).
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1024


def test_status_listener_retention_bounded(spark):
    # ui.enabled=false does not stop status listeners; 1000 retained SQL
    # executions of AQE plan snapshots OOM a long-lived driver.
    assert int(spark.conf.get("spark.sql.ui.retainedExecutions")) <= 32
    assert int(spark.conf.get("spark.ui.retainedJobs")) <= 200


def test_engine_conf_dict_matches_session(spark):
    # engine_conf() is the single source both launch modes draw from
    # (get_spark and tools/submit_crawl.py); a key drifting between the
    # dict and the live session means one mode silently lost a tuning.
    from artemis_spark.session import engine_conf

    for k, v in engine_conf(4).items():
        if k == "spark.driver.memory":
            continue  # fixed at JVM start; suite JVM may predate the env
        assert spark.conf.get(k) == v, k


def test_copartition_and_aqe(spark):
    # zero-exchange host-keyed joins (Phi colocation) and runtime skew
    # handling are load-bearing plan shapes, not tuning suggestions.
    assert spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
