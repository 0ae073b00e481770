"""Same-substrate A/B: r01 engine vs current engine, interleaved.

VERDICT r03 item 1: the driver-recorded bench fell two rounds running
(18,875 -> 8,850 -> 6,676 URLs/s) against probe-supported host-drift
explanations.  The decisive experiment: run the r01 engine (git
worktree at the round-1 commit) and the current engine back-to-back in
ONE host window, >= 2 reps each, ABBA order (cancels linear drift),
with the DRAM-stream probe bracketing every run.  Identical
rounds/budget/tier/cpus/memory config for both; each engine crawls the
web its own datagen generates (tier spec identical: 512 hosts x 1172
pages), exactly as each was graded.

Usage:  python tools/ab_bench.py [--quick]
Writes: /tmp/ab_results.jsonl (one line per probe/run) + summary line.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench_runner import (  # noqa: E402
    make_emit,
    median_of,
    probe,
    run_crawl_subprocess,
)

ENGINES = {
    "r01": {"cwd": "/tmp/ab_r01_engine", "tmpdir": "/tmp/ab_r01_tmp"},
    "r04": {"cwd": "/tmp/ab_r04_engine", "tmpdir": "/tmp"},
}

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

OUT = "/tmp/ab_results.jsonl"
emit = make_emit(OUT)


def prewarm(name: str) -> None:
    """Build the engine's own web cache outside the timed window."""
    e = ENGINES[name]
    env = dict(os.environ, TMPDIR=e["tmpdir"])
    code = (
        "import tempfile, os; from artemis_spark.datagen import generate;"
        "d = os.path.join(tempfile.gettempdir(), 'artemis_bench_web_bench');"
        "m = [os.path.join(d, x) for x in"
        " ('_DONE', '_DONE_v2', '_DONE_v3', '_DONE_v4', '_DONE_v5')];"
        "done = any(os.path.exists(x) for x in m);"
        "(None if done else (generate('bench', d),"
        " [open(x, 'w').close() for x in m]))"
    )
    subprocess.run([sys.executable, "-c", code], cwd=e["cwd"], env=env, check=True)
    emit({"kind": "prewarm_done", "engine": name})


def run_engine(name: str, rep: int) -> dict:
    e = ENGINES[name]
    env = dict(os.environ, TMPDIR=e["tmpdir"], **COMMON_ENV)
    return run_crawl_subprocess(
        e["cwd"], env, emit, {"engine": name, "rep": rep}
    )


def main() -> None:
    open(OUT, "w").close()
    quick = "--quick" in sys.argv
    emit({"kind": "config", **COMMON_ENV, "order": "ABBA" if not quick else "AB"})

    prewarm("r01")
    prewarm("r04")

    order = ["r01", "r04"] if quick else ["r01", "r04", "r04", "r01"]
    reps: dict[str, int] = {}
    results: dict[str, list] = {"r01": [], "r04": []}
    probe(emit)
    for name in order:
        reps[name] = reps.get(name, 0) + 1
        r = run_engine(name, reps[name])
        if r:
            results[name].append(r)
        probe(emit)

    summary = {
        "kind": "summary",
        "r01_median_round": median_of(results["r01"], "urls_per_sec_median_round"),
        "r04_median_round": median_of(results["r04"], "urls_per_sec_median_round"),
        "r01_steady": median_of(results["r01"], "urls_per_sec_steady"),
        "r04_steady": median_of(results["r04"], "urls_per_sec_steady"),
        "r01_overall": median_of(results["r01"], "urls_per_sec"),
        "r04_overall": median_of(results["r04"], "urls_per_sec"),
    }
    if summary["r01_median_round"] and summary["r04_median_round"]:
        summary["r04_over_r01_median"] = round(
            summary["r04_median_round"] / summary["r01_median_round"], 3
        )
    emit(summary)


if __name__ == "__main__":
    main()
