#!/usr/bin/env python3
"""Bench regression guard: diff two full bench maps, fail loudly on slowdowns.

Usage:
    python3 tools/bench_diff.py [CURRENT] [PREVIOUS]

Defaults: CURRENT = BENCH_full_latest.json, PREVIOUS = the highest-numbered
BENCH_full_r{N}.json whose content differs from CURRENT (so running right
after a bench, where latest == r{N}, compares against the round before).

A query is flagged when it is BOTH >1.5x slower and >0.3s absolute slower
than the previous round (the absolute floor keeps 0.2s->0.35s jitter on
tiny queries from failing the gate). Exit 1 if any query is flagged or the
common-set total regressed >20%.

Round-7 lesson: an 8x per-query regression (q_dedup_jaccard 1.00->8.12s)
shipped in the round artifact and only the judge's diff caught it — and it
then turned out to be transient machine contention, invisible without a
round-over-round diff either way. Run this after every full bench.
"""
import json
import sys
from pathlib import Path

RATIO = 1.5
ABS_FLOOR = 0.3
TOTAL_RATIO = 1.2


def load(path):
    with open(path) as f:
        return json.load(f)


def pick_previous(current_path):
    cur = Path(current_path).read_text()
    rounds = sorted(Path(".").glob("BENCH_full_r*.json"),
                    key=lambda p: int(p.stem.split("_r")[1]), reverse=True)
    for p in rounds:
        if p.read_text() != cur:
            return str(p)
    return None


def main():
    current = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full_latest.json"
    previous = sys.argv[2] if len(sys.argv) > 2 else pick_previous(current)
    if previous is None:
        print("bench_diff: no previous round artifact found; nothing to diff")
        return 0
    cur, prev = load(current)["queries"], load(previous)["queries"]
    common = sorted(set(cur) & set(prev))
    if not common:
        print(f"bench_diff: no common queries between {current} and {previous}")
        return 0

    flagged = []
    for q in common:
        if cur[q] > prev[q] * RATIO and cur[q] - prev[q] > ABS_FLOOR:
            flagged.append((cur[q] / prev[q], q))
    cur_total = sum(cur[q] for q in common)
    prev_total = sum(prev[q] for q in common)

    print(f"bench_diff: {current} vs {previous} — {len(common)} common queries")
    print(f"  common-set total: {prev_total:.1f}s -> {cur_total:.1f}s "
          f"({cur_total / prev_total:.2f}x)")
    for ratio, q in sorted(flagged, reverse=True):
        print(f"  REGRESSED {q}: {prev[q]:.2f}s -> {cur[q]:.2f}s ({ratio:.1f}x)")

    ok = True
    if flagged:
        print(f"FAIL: {len(flagged)} queries regressed >{RATIO}x (+>{ABS_FLOOR}s)")
        ok = False
    if cur_total > prev_total * TOTAL_RATIO:
        print(f"FAIL: common-set total regressed >{int((TOTAL_RATIO-1)*100)}%")
        ok = False
    if ok:
        print("OK: no per-query or total regression")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
