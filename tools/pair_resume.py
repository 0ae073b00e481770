"""Resume an interrupted interleaved pair run (tools/pair_bench.py).

A pair_bench run that dies mid-sequence (session crash, host reclaim)
leaves a log of completed per-run JSON lines.  This tool appends the
REMAINING runs of the ABBA order to the same log — each run re-executed
under the identical env/config — then recomputes the summary line over
every run in the log, so nothing measured is discarded.

Usage:
    ARTEMIS_BENCH_TIER=huge4k ARTEMIS_BENCH_ROUNDS=5 \
    ARTEMIS_BENCH_BUDGET=1172 \
    python tools/pair_resume.py bench_logs/pair_2_8_huge4k_r4.log 8 8 2

The positional ints after the log path are the levels to run, in order.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from scaling_bench import run_at  # noqa: E402


def main() -> None:
    log_path = sys.argv[1]
    seq = [int(x) for x in sys.argv[2:]]
    tier = os.environ.get("ARTEMIS_BENCH_TIER", "huge")
    rounds = int(os.environ.get("ARTEMIS_BENCH_ROUNDS", "5"))
    budget = int(os.environ.get("ARTEMIS_BENCH_BUDGET", "1172"))

    done: list[dict] = []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "seq" in rec:  # skip any previous summary line
                done.append(rec)

    with open(log_path, "a") as out:
        for n in seq:
            r = run_at(n, tier, rounds, budget, reps=1)
            rec = {
                "seq": len(done),
                "cpus": n,
                "median": r.get("urls_per_sec_median_round") or r["urls_per_sec"],
                "steady": r.get("urls_per_sec_steady"),
                "probe_n8": r.get("hw_probe_tasks_per_sec_n8"),
                "wall_sec": r.get("wall_sec"),
                "per_round": r.get("per_round"),
            }
            done.append(rec)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps({k: rec[k] for k in rec if k != "per_round"}), flush=True)

        levels = sorted({r["cpus"] for r in done})
        if len(levels) != 2:
            # a summary over one level is degenerate (eff=1.0) and over
            # 3+ levels silently drops the middle — refuse both
            msg = {"error": "summary needs exactly two levels", "levels": levels}
            out.write(json.dumps(msg) + "\n")
            print(json.dumps(msg), flush=True)
            return
        lo, hi = levels[0], levels[-1]
        lo_meds = [r["median"] for r in done if r["cpus"] == lo]
        hi_meds = [r["median"] for r in done if r["cpus"] == hi]
        eff = (statistics.median(hi_meds) / statistics.median(lo_meds)) / (hi / lo)
        summary = {
            "levels": [lo, hi],
            "order": [r["cpus"] for r in done],
            "lo_medians": lo_meds,
            "hi_medians": hi_meds,
            "lo_probes": [r["probe_n8"] for r in done if r["cpus"] == lo],
            "hi_probes": [r["probe_n8"] for r in done if r["cpus"] == hi],
            "efficiency_of_medians": round(eff, 3),
        }
        # the ABBA order's drift-cancellation claim requires a BALANCED
        # sequence; an unbalanced resume still gets its numbers reported
        # but explicitly marked partial
        if len(lo_meds) != len(hi_meds):
            summary["partial"] = (
                f"unbalanced: {len(lo_meds)} runs at {lo} vs "
                f"{len(hi_meds)} at {hi} — drift does not cancel"
            )
        out.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
