"""Profile the crawl bench: per-stage hotspots + utilization from the UI REST API."""
from __future__ import annotations

import json
import os
import time
import urllib.request


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def main():
    from artemis_spark import session

    _orig = session.get_spark

    def patched(*a, **kw):
        kw.setdefault("extra_conf", {})
        kw["extra_conf"]["spark.ui.enabled"] = "true"
        return _orig(*a, **kw)

    session.get_spark = patched

    import bench

    spark = session.get_spark("artemis_profile")
    tier = os.environ.get("ARTEMIS_BENCH_TIER", "bench")
    rounds = int(os.environ.get("ARTEMIS_BENCH_ROUNDS", "4"))
    budget = int(os.environ.get("ARTEMIS_BENCH_BUDGET", "512"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    t0 = time.monotonic()
    out = bench.bench_crawl(spark, tier, rounds, budget)
    wall = time.monotonic() - t0
    print(json.dumps(out))

    app = rest("applications")[0]["id"]
    stages = rest(f"applications/{app}/stages?status=complete")
    tot = sum(s["executorRunTime"] for s in stages)
    print(f"\nwall={wall:.1f}s  total_task_time={tot/1000:.1f}s  used={tot/1000/wall:.1f}/{cpus} cores")
    agg = {}
    for s in stages:
        key = s["name"].split(" ")[0] + " | " + s.get("details", "").split("\n")[0][:0]
        # aggregate by stage name + first line of description
        d = s.get("description") or s["name"]
        agg.setdefault(d[:90], [0, 0, 0])
        agg[d[:90]][0] += s["executorRunTime"]
        agg[d[:90]][1] += s["numCompleteTasks"]
        agg[d[:90]][2] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'task_s':>8} {'tasks':>6} {'stages':>6}  description")
    for d, (ms, nt, ns) in rows[:25]:
        print(f"{ms/1000:8.1f} {nt:6d} {ns:6d}  {d}")


if __name__ == "__main__":
    main()
