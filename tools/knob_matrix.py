"""Interleaved same-window matrix: r01 anchor vs current engine variants.

Extends tools/ab_bench.py (VERDICT r03 item 1) with conf-knob variants
of the current engine, all interleaved in ONE host window with the
DRAM-stream probe bracketing every run so engine effects separate from
host drift.  Order is a palindrome (ABCCBA...) to cancel linear drift.

Variants:
  r01    — round-1 engine worktree (the A/B anchor, graded config)
  r04    — current HEAD worktree, default conf
  r04cg  — current HEAD + spark.sql.codegen.cache.maxEntries=4096
           (default 100-entry Janino LRU recompiles ~340 classes/round)
  r04cgbf— r04cg + runtime bloomFilter join pruning off (the crawl loop
           carries its own explicit bloom pre-dedup; Spark's adds a
           per-join agg subquery job per round)

Usage: python tools/knob_matrix.py [reps]    (default 2)
Writes /tmp/knob_matrix.jsonl
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench_runner import (  # noqa: E402
    make_emit,
    median_of,
    probe,
    run_crawl_subprocess,
)

COMMON_ENV = {
    "ARTEMIS_BENCH_TIER": "bench",
    "ARTEMIS_BENCH_ROUNDS": "6",
    "ARTEMIS_BENCH_BUDGET": "1024",
    "SPARK_GRAFT_CPUS": "32",
    "ARTEMIS_BENCH_SEEDS_PER_HOST": "64",
    "ARTEMIS_BENCH_REVISIT": "1",
    "ARTEMIS_DRIVER_MEM": "56g",
    "ARTEMIS_LOCAL_DIR": "/dev/shm/spark-local",
    "ARTEMIS_STATE_BASE": "/dev/shm",
}

CG = '{"spark.sql.codegen.cache.maxEntries":"4096"}'
CGBF = (
    '{"spark.sql.codegen.cache.maxEntries":"4096",'
    '"spark.sql.optimizer.runtime.bloomFilter.enabled":"false"}'
)

VARIANTS = {
    "r01": {"cwd": "/tmp/ab_r01_engine", "tmpdir": "/tmp/ab_r01_tmp", "env": {}},
    "r04": {"cwd": "/tmp/ab_r04_engine", "tmpdir": "/tmp", "env": {}},
    "r04cg": {
        "cwd": "/tmp/ab_r04_engine",
        "tmpdir": "/tmp",
        "env": {"ARTEMIS_EXTRA_CONF": CG},
    },
    "r04cgbf": {
        "cwd": "/tmp/ab_r04_engine",
        "tmpdir": "/tmp",
        "env": {"ARTEMIS_EXTRA_CONF": CGBF},
    },
}

OUT = "/tmp/knob_matrix.jsonl"
emit = make_emit(OUT)


def run_variant(name: str, rep: int) -> dict:
    v = VARIANTS[name]
    env = dict(os.environ, TMPDIR=v["tmpdir"], **COMMON_ENV, **v["env"])
    return run_crawl_subprocess(
        v["cwd"], env, emit, {"variant": name, "rep": rep},
        keys=("urls_per_sec", "urls_per_sec_steady",
              "urls_per_sec_median_round", "urls", "wall_sec", "per_round"),
    )


def main() -> None:
    open(OUT, "w").close()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = list(VARIANTS)
    order = []
    for i in range(reps):
        order += names if i % 2 == 0 else names[::-1]  # palindrome
    emit({"kind": "config", **COMMON_ENV, "order": order})

    results: dict[str, list] = {n: [] for n in names}
    counts: dict[str, int] = {}
    probe(emit)
    for name in order:
        counts[name] = counts.get(name, 0) + 1
        r = run_variant(name, counts[name])
        if r:
            results[name].append(r)
        probe(emit)

    summary = {"kind": "summary"}
    for n in names:
        summary[f"{n}_median_round"] = median_of(
            results[n], "urls_per_sec_median_round"
        )
        summary[f"{n}_steady"] = median_of(results[n], "urls_per_sec_steady")
        summary[f"{n}_overall"] = median_of(results[n], "urls_per_sec")
    if summary.get("r01_median_round"):
        for n in names[1:]:
            if summary.get(f"{n}_median_round"):
                summary[f"{n}_over_r01"] = round(
                    summary[f"{n}_median_round"] / summary["r01_median_round"], 3
                )
    emit(summary)


if __name__ == "__main__":
    main()
