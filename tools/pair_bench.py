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
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench_runner import pair_run_record, pair_summary  # noqa: E402


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
        rec = pair_run_record(idx, n, tier, rounds, budget)
        runs.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps(pair_summary(runs)), flush=True)


if __name__ == "__main__":
    main()
