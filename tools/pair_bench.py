"""Interleaved two-level scaling measurement.

The 5-level sweeps run their parallelism levels SEQUENTIALLY, so a
monotonic substrate drift on this shared VM lands entirely on one side
of an N->4N comparison (the round-4 fixed-engine sweep drew a
22.7-probe window for local[2] and a 12.4-probe window for local[8],
depressing the raw 2->8 ratio below the window's own DRAM ceiling).

This harness runs the graded pair INTERLEAVED in ABBA order —
N, 4N, 4N, N, N, 4N, ... — so both levels sample the same window mix
and linear drift cancels in the medians.  Every run embeds its own
DRAM probe (bench.py reports hw_probe_tasks_per_sec_n8); all runs are
disclosed, nothing is discarded.

Usage:  python tools/pair_bench.py            # levels 2 and 8, 3 reps each
        ARTEMIS_PAIR_LEVELS="4 16" ARTEMIS_PAIR_REPS=2 python tools/pair_bench.py
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
    lo, hi = (
        int(x) for x in os.environ.get("ARTEMIS_PAIR_LEVELS", "2 8").split()
    )
    reps = int(os.environ.get("ARTEMIS_PAIR_REPS", "3"))
    tier = os.environ.get("ARTEMIS_BENCH_TIER", "huge")
    rounds = int(os.environ.get("ARTEMIS_BENCH_ROUNDS", "5"))
    budget = int(os.environ.get("ARTEMIS_BENCH_BUDGET", "1172"))

    # ABBA chain: lo,hi,hi,lo,lo,hi,... — every adjacent pair appears in
    # both orders, so a linear drift contributes equally to both levels.
    order: list[int] = []
    for i in range(reps):
        order += [lo, hi] if i % 2 == 0 else [hi, lo]

    runs: list[dict] = []
    for idx, n in enumerate(order):
        r = run_at(n, tier, rounds, budget, reps=1)
        rec = {
            "seq": idx,
            "cpus": n,
            "median": r.get("urls_per_sec_median_round") or r["urls_per_sec"],
            "steady": r.get("urls_per_sec_steady"),
            "probe_n8": r.get("hw_probe_tasks_per_sec_n8"),
            "wall_sec": r.get("wall_sec"),
            # full per-round walls so tools/pair_analyze.py can fit the
            # serial + parallel/N decomposition on matched waves
            "per_round": r.get("per_round"),
        }
        runs.append(rec)
        print(json.dumps(rec), flush=True)

    lo_meds = [r["median"] for r in runs if r["cpus"] == lo]
    hi_meds = [r["median"] for r in runs if r["cpus"] == hi]
    eff = (statistics.median(hi_meds) / statistics.median(lo_meds)) / (hi / lo)
    out = {
        "levels": [lo, hi],
        "order": order,
        "lo_medians": lo_meds,
        "hi_medians": hi_meds,
        "lo_probes": [r["probe_n8"] for r in runs if r["cpus"] == lo],
        "hi_probes": [r["probe_n8"] for r in runs if r["cpus"] == hi],
        "efficiency_of_medians": round(eff, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
