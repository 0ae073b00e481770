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

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from scaling_bench import hw_stream_throughput  # noqa: E402

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


def emit(rec: dict) -> None:
    rec["t"] = round(time.monotonic(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe() -> float:
    v = hw_stream_throughput([8], reps=2)[8]
    emit({"kind": "probe", "n8_tasks_per_sec": v})
    return v


def run_variant(name: str, rep: int) -> dict:
    v = VARIANTS[name]
    env = dict(os.environ, TMPDIR=v["tmpdir"], **COMMON_ENV, **v["env"])
    t0 = time.monotonic()
    out = subprocess.run(
        [sys.executable, "bench.py", "--crawl-only"],
        cwd=v["cwd"],
        env=env,
        capture_output=True,
        text=True,
    )
    wall = time.monotonic() - t0
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        emit({"kind": "run_failed", "variant": name, "rep": rep,
              "rc": out.returncode, "stderr_tail": out.stderr[-2000:]})
        return {}
    crawl = json.loads(lines[-1])["crawl"]
    rec = {"kind": "run", "variant": name, "rep": rep,
           "wall_incl_setup": round(wall, 1)}
    for k in ("urls_per_sec", "urls_per_sec_steady", "urls_per_sec_median_round",
              "urls", "wall_sec", "per_round"):
        rec[k] = crawl.get(k)
    emit(rec)
    return rec


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
    probe()
    for name in order:
        counts[name] = counts.get(name, 0) + 1
        r = run_variant(name, counts[name])
        if r:
            results[name].append(r)
        probe()

    def med(rs, key):
        vals = sorted(x[key] for x in rs if x.get(key))
        return vals[len(vals) // 2] if vals else None

    summary = {"kind": "summary"}
    for n in names:
        summary[f"{n}_median_round"] = med(results[n], "urls_per_sec_median_round")
        summary[f"{n}_steady"] = med(results[n], "urls_per_sec_steady")
        summary[f"{n}_overall"] = med(results[n], "urls_per_sec")
    if summary.get("r01_median_round"):
        for n in names[1:]:
            if summary.get(f"{n}_median_round"):
                summary[f"{n}_over_r01"] = round(
                    summary[f"{n}_median_round"] / summary["r01_median_round"], 3
                )
    emit(summary)


if __name__ == "__main__":
    main()
