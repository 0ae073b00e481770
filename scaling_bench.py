"""Scaling-efficiency evidence (north_rule: throughput efficiency >= 0.8
going from N to 4N executors).

No real cluster exists in this sandbox, so per BASELINE.md the same
crawl job runs on the same input at two parallelism levels —
local[8] (N) and local[32] (4N) — in separate processes (a Spark
master is fixed per JVM).  Writes BENCH.md with both throughputs and
the derived efficiency  (T_4N / T_N) / 4.

Note on interpretation: local-mode "executors" are threads of one JVM
sharing one driver, so this under-reports true multi-executor scaling
(shared GC, shared shuffle disk, fixed driver-side job scheduling
overhead) — the cluster run would shard those too.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int, tier: str, rounds: int, budget: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        ARTEMIS_BENCH_TIER=tier,
        ARTEMIS_BENCH_ROUNDS=str(rounds),
        ARTEMIS_BENCH_BUDGET=str(budget),
    )
    env.setdefault("ARTEMIS_DRIVER_MEM", "48g")
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        env.setdefault("ARTEMIS_LOCAL_DIR", "/dev/shm/spark-local")
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--crawl-only"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    tier = os.environ.get("ARTEMIS_BENCH_TIER", "bench")
    rounds = int(os.environ.get("ARTEMIS_BENCH_ROUNDS", "6"))
    budget = int(os.environ.get("ARTEMIS_BENCH_BUDGET", "64"))
    n, four_n = 8, 32

    a = run_at(n, tier, rounds, budget)["crawl"]
    b = run_at(four_n, tier, rounds, budget)["crawl"]
    key = "urls_per_sec_steady" if a.get("urls_per_sec_steady") else "urls_per_sec"
    eff = (b[key] / a[key]) / (four_n / n)

    lines = [
        "# BENCH — crawl-loop throughput & scaling evidence",
        "",
        "North metric: URLs scheduled+fetched/sec; scaling criterion:",
        "efficiency >= 0.8 from N to 4N executors (BASELINE.json).",
        "Sandbox evidence per BASELINE.md: identical job + input at",
        f"local[{n}] vs local[{four_n}] (no real cluster available).",
        "",
        "| run | parallelism | URLs | wall s | URLs/sec | steady URLs/sec |",
        "|---|---|---|---|---|---|",
        f"| A | local[{n}] (N) | {a['urls']} | {a['wall_sec']} | {a['urls_per_sec']} | {a.get('urls_per_sec_steady')} |",
        f"| B | local[{four_n}] (4N) | {b['urls']} | {b['wall_sec']} | {b['urls_per_sec']} | {b.get('urls_per_sec_steady')} |",
        "",
        f"**Scaling efficiency (B/A)/4 on {key} = {eff:.3f}**  (target >= 0.8)",
        "",
        f"Config: tier={tier}, rounds={rounds}, politeness_budget={budget},",
        "AQE on, web tables cached pre-partitioned on join keys.",
        "",
        "Caveat: local-mode threads share one JVM/driver (GC, shuffle disk,",
        "job scheduling), so this under-reports true multi-executor scaling;",
        "per-round driver-side fixed overhead (~3-4 s) is parallelism-",
        "independent and dominates small rounds.",
        "",
        "Raw:",
        "```json",
        json.dumps({"N": a, "4N": b, "efficiency": round(eff, 3)}, indent=1),
        "```",
    ]
    with open(os.path.join(HERE, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": round(eff, 3), "N": a["urls_per_sec"], "4N": b["urls_per_sec"]}))


if __name__ == "__main__":
    main()
