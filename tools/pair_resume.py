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
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench_runner import pair_run_record, pair_summary  # noqa: E402


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
            rec = pair_run_record(len(done), n, tier, rounds, budget)
            done.append(rec)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps({k: rec[k] for k in rec if k != "per_round"}), flush=True)

        # a summary over one level is degenerate (eff=1.0) and over 3+
        # levels silently drops the middle — pair_summary refuses both
        try:
            summary = pair_summary(done)
        except ValueError as e:
            msg = {"error": str(e)}
            out.write(json.dumps(msg) + "\n")
            print(json.dumps(msg), flush=True)
            return
        out.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
