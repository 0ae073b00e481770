"""Decompose an interleaved pair run into serial + parallel round cost.

Reads a tools/pair_bench.py log (one JSON line per run, final summary
line) and, for every round index that both levels ran with the SAME
scheduled wave (the synthetic web is deterministic, so matched rounds
have identical waves), fits the two-point Amdahl model

    wall(N) = serial + parallel / N

giving the per-round driver-sequenced cost (planning, small-job
scheduling, state-store commits — independent of parallelism) and the
distributed work.  Prints per-round efficiency, the fitted terms, and
what the same waves would yield at perfect-serial-elimination, so the
BENCH.md narrative can say how much of the efficiency gap is
engine-owned serial time vs substrate.

Usage: python tools/pair_analyze.py bench_logs/pair_2_8_huge4k_r4.log
"""

from __future__ import annotations

import json
import statistics
import sys
from collections import defaultdict


def main(path: str) -> None:
    runs = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "cpus" in d:
            runs.append(d)
    # older pair logs lack per_round; fall back to scanning any embedded
    # bench.py JSON lines present in the same log
    full = [r for r in runs if r.get("per_round")]
    if not full:
        for line in open(path):
            if '"per_round"' in line:
                try:
                    d = json.loads(line[line.index("{") :])
                except ValueError:
                    continue
                c = d.get("crawl", d)
                if "per_round" in c:
                    full.append(c)
    if not full:
        print("no per-round data found in", path)
        return

    by_level: dict[int, list[dict]] = defaultdict(list)
    for c in full:
        by_level[c["cpus"]].append(c)
    levels = sorted(by_level)
    if len(levels) != 2:
        print("need exactly two levels, found", levels)
        return
    lo, hi = levels

    def med_walls(cs: list[dict]) -> dict[int, tuple[int, float]]:
        acc: dict[int, list[tuple[int, float]]] = defaultdict(list)
        for c in cs:
            for r in c["per_round"]:
                acc[r["round"]].append((r["scheduled"], r["round_wall_ms"] / 1000))
        out: dict[int, tuple[int, float]] = {}
        for i, v in acc.items():
            scheds = {s for s, _ in v}
            if len(scheds) != 1:
                # reps at the same level must crawl the identical
                # deterministic wave; pooling walls across different
                # waves would corrupt the matched-wave fit
                print(
                    f"round {i}: scheduled disagrees across same-level reps"
                    f" {sorted(scheds)} — round dropped"
                )
                continue
            out[i] = (v[0][0], statistics.median(w for _, w in v))
        return out

    wl, wh = med_walls(by_level[lo]), med_walls(by_level[hi])
    print(f"round  sched      wall[{lo}]  wall[{hi}]  eff  serial_s  par_core_s")
    tot_s, tot_p = [], []
    for i in sorted(set(wl) & set(wh)):
        s_lo, t_lo = wl[i]
        s_hi, t_hi = wh[i]
        if s_lo != s_hi:
            print(f"{i}: wave mismatch ({s_lo} vs {s_hi}) — skipped")
            continue
        eff = (t_lo / t_hi) / (hi / lo)
        # two-point fit: t = serial + par/N
        par = (t_lo - t_hi) / (1 / lo - 1 / hi)
        ser = t_lo - par / lo
        print(
            f"{i:5d}  {s_lo:9,d}  {t_lo:8.1f}  {t_hi:8.1f}  {eff:.3f}"
            f"  {ser:8.1f}  {par:10.1f}"
        )
        if i > 0:
            tot_s.append(ser)
            tot_p.append(par)
    if tot_s:
        ser, par = statistics.median(tot_s), statistics.median(tot_p)
        print(
            f"\nmedian steady round: serial={ser:.1f}s,"
            f" parallel={par:.1f} core-s"
            f" -> modeled eff({lo}->{hi}) ="
            f" {((ser + par / lo) / (ser + par / hi)) / (hi / lo):.3f},"
            f" serial-free ceiling = 1.000"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bench_logs/pair_r4.log")
