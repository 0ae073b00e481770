"""Stage-level profile of huge-tier crawl rounds: wall vs task-time per stage."""
from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile
import time
import urllib.request


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def ts(s):
    return dt.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main():
    from artemis_spark import session

    _orig = session.get_spark

    def patched(*a, **kw):
        kw.setdefault("extra_conf", {})
        kw["extra_conf"]["spark.ui.enabled"] = "true"
        return _orig(*a, **kw)

    session.get_spark = patched
    import bench as B
    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = session.get_spark("prof_stages")
    tier = "huge"
    web_dir = os.path.join(tempfile.gettempdir(), f"artemis_bench_web_{tier}")
    seeds = B._dense_seeds(web_dir, tier, 256)
    state_dir = f"/dev/shm/artemis_profstate_{os.getpid()}"
    shutil.rmtree(state_dir, ignore_errors=True)
    cfg = CrawlConfig(
        politeness_budget=1172, num_partitions=cpus, bloom_shards=cpus * 2,
        light_stats=True, revisit_delay_rounds=1,
    )
    eng = CrawlEngine(spark, web_dir, state_dir, cfg, seeds_path=seeds)
    eng.bootstrap()
    app = rest("applications")[0]["id"]
    for r in range(3):
        before = {s["stageId"] for s in rest(f"applications/{app}/stages")}
        t0 = time.monotonic()
        st = eng.run_round()
        wall = time.monotonic() - t0
        stages = [
            s for s in rest(f"applications/{app}/stages?status=complete")
            if s["stageId"] not in before
        ]
        tot = sum(s["executorRunTime"] for s in stages)
        print(f"\n== round {r} wall={wall:.1f}s sched={st['scheduled']} "
              f"task_total={tot/1000:.0f}s util={tot/1000/wall:.1f}/{cpus}")
        if r < 1:
            continue
        rows = []
        for s in stages:
            try:
                sw = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
            except Exception:
                sw = -1
            rows.append((s["executorRunTime"] / 1000, sw, s["numCompleteTasks"],
                         s["stageId"], s["name"].split(" at ")[0][:38],
                         (s.get("description") or "")[:42]))
        rows.sort(key=lambda x: -x[1])
        print(f"{'task_s':>7} {'wall_s':>7} {'tasks':>5} {'sid':>5}  name | desc")
        for tsk, sw, nt, sid, nm, d in rows[:18]:
            print(f"{tsk:7.1f} {sw:7.1f} {nt:5d} {sid:5d}  {nm} | {d}")
    shutil.rmtree(state_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
