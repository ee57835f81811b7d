#!/usr/bin/env python3
"""Bench regression guard: diff two full bench maps, fail loudly on slowdowns.

Usage:
    python3 tools/bench_diff.py [CURRENT] [PREVIOUS]

Defaults: CURRENT = BENCH_full_latest.json, PREVIOUS = the highest-numbered
BENCH_full_r{N}.json whose content differs from CURRENT (so running right
after a bench, where latest == r{N}, compares against the round before).

Contention normalization (round-9): each artifact may carry a sentinel
trace — a fixed query (q1_pricing_summary) re-timed min-of-2 at every
~20-query segment boundary — with per-segment ``contention_index`` values
relative to the run's MEDIAN sentinel observation (see Bench.scala). Two
corrections are applied before comparing:

 1. WITHIN-RUN: a query's time is divided by its segment's index when the
    index is outside the deadband [0.85, 1.20] — contention that ramps up
    mid-run deflates back to run-median terms, while ordinary sentinel
    jitter is NOT amplified into per-query noise.
 2. CROSS-RUN: the sentinel's plan never changes, so the ratio of the two
    artifacts' sentinel baselines (medians) measures relative machine
    speed between the runs — a UNIFORMLY loaded box (the round-8 failure
    mode: every probe inflated together) is caught here. The current run's
    times are divided by that ratio when it is outside [0.90, 1.11]
    (clamped to [0.5, 3] so a broken sentinel can't nuke the comparison).

Known tradeoff, accepted deliberately: a code regression in the shared
scan path would move the sentinel too and be partially masked — but such
a regression moves EVERY query and still shows in the raw totals, which
are always printed alongside. Rounds 7 and 8 both lost their perf signal
to contention misread as regression (r8: driver artifact 190.9s vs 118.2s
for the identical commit); this guard makes that failure mode visible.

A run is labeled ENVIRONMENT-INFLATED when its sentinel baseline exceeds
the other run's by >15%, or UNSTABLE when its own sentinel spread
(max/min) exceeds 1.6. On such runs, per-query threshold breaches are
reported as SUSPECT (re-measure on a quiet box) instead of failing the
gate — contention is not uniform across queries (a CPU-parallel query
starves harder than the sentinel), so normalized outliers on a loaded box
are unreliable.

A query is flagged when it is BOTH >1.5x slower and >0.3s absolute slower
than the previous round AFTER normalization (the absolute floor keeps
0.2s->0.35s jitter on tiny queries from failing the gate). Exit 1 if any
query is flagged on a clean run or the common-set total regressed >20%.

Per-segment threshold scaling (round-10): the 1.5x ratio threshold for a
query is additionally scaled by its segment's RAW contention index when
that index exceeds 1.0 — a query timed while the sentinel ran 1.15x slow
must clear 1.5*1.15 = 1.73x to flag (contention is not uniform across
queries, so residual inflation inside the deadband still biases the
ratio). Each flag line is annotated with its segment's index, and a flag
whose segment sentinel itself regressed >SEGMENT_SUSPECT (1.3x) is
reported as SUSPECT for that query alone, never a FAIL — the sentinel
already proves the box was loaded right then.
"""
import json
import statistics
import sys
from pathlib import Path

RATIO = 1.5
ABS_FLOOR = 0.3
TOTAL_RATIO = 1.2
ENV_INFLATED = 1.15
DEADBAND = (0.85, 1.20)
CROSS_DEADBAND = (0.90, 1.11)
SPREAD_UNSTABLE = 1.6
SEGMENT_SUSPECT = 1.3


def load(path):
    with open(path) as f:
        return json.load(f)


def pick_previous(current_path):
    """Newest prior-round artifact, PREFERRING the builder pair.

    Each round may leave two same-round artifacts: the builder's
    committed ``BENCH_full_r{N}_builder.json`` (quiet-box, the honest
    baseline) and the driver's post-review ``BENCH_full_r{N}.json``
    (often contended — r14's driver map ran 295.7s vs the builder's
    177.7s for the identical commit, flattering every later diff).
    Within a round the builder artifact wins; rounds still order
    newest-first."""
    cur = Path(current_path).read_text()
    def key(p):
        tail = p.stem.split("_r")[1]
        n = int(tail.split("_")[0])
        return (n, 1 if tail.endswith("_builder") else 0)
    rounds = sorted(Path(".").glob("BENCH_full_r*.json"), key=key,
                    reverse=True)
    for p in rounds:
        if p.read_text() != cur:
            return str(p)
    return None


def contention(artifact):
    """(per-query index map, raw index map, sentinel baseline, spread).

    Indices inside the deadband collapse to 1.0 — only clear excursions
    normalize. The RAW (un-deadbanded) index is kept separately: it
    scales per-query flag thresholds and drives per-query SUSPECT
    suppression. Artifacts older than the round-9 protocol carry no
    segments: every query maps to 1.0 (raw comparison, old behavior).
    """
    per_query, per_query_raw = {}, {}
    for seg in artifact.get("segments") or []:
        raw = seg.get("contention_index")
        if raw is None or raw <= 0:
            raw = 1.0
        idx = 1.0 if DEADBAND[0] <= raw <= DEADBAND[1] else raw
        for q in seg.get("queries", []):
            per_query[q] = idx
            per_query_raw[q] = raw
    sent = artifact.get("sentinel") or {}
    base = sent.get("baseline")
    # drop the first probe: it is structurally cold (JVM startup phase)
    # and excluded from the artifact's own baseline too (see Bench.scala)
    times = [t for t in sent.get("times", [])[1:] if t and t > 0]
    spread = (max(times) / min(times)) if len(times) >= 2 else 1.0
    return per_query, per_query_raw, base, spread


def check_keys(a_path, b_path):
    """Artifact key-set guard (round-12): exit 1 when the two artifacts
    do not cover the same query set — the r11 failure mode was an sf1
    scale artifact silently missing the round's 18 new queries, leaving
    their scale exponents as unverifiable prose. Usage:
        bench_diff.py --check-keys BENCH_sf1_full.json BENCH_full_latest.json
    (second artifact defaults to BENCH_full_latest.json = the registry
    as of the last full run)."""
    a, b = load(a_path), load(b_path)
    ka, kb = set(a["queries"]), set(b["queries"])
    missing, extra = sorted(kb - ka), sorted(ka - kb)
    print(f"check-keys: {a_path} ({len(ka)} queries) vs {b_path} ({len(kb)})")
    for q in missing:
        print(f"  MISSING from {a_path}: {q}")
    for q in extra:
        print(f"  EXTRA in {a_path} (not in registry artifact): {q}")
    if missing or extra:
        print(f"FAIL: key sets differ ({len(missing)} missing, {len(extra)} extra)"
              f" — regenerate {a_path} for the full registry")
        return 1
    print("OK: key sets identical")
    return 0


def main():
    if sys.argv[1:2] == ["--check-keys"]:
        a = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1_full.json"
        b = sys.argv[3] if len(sys.argv) > 3 else "BENCH_full_latest.json"
        return check_keys(a, b)
    current = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full_latest.json"
    previous = sys.argv[2] if len(sys.argv) > 2 else pick_previous(current)
    if previous is None:
        print("bench_diff: no previous round artifact found; nothing to diff")
        return 0
    cur_art, prev_art = load(current), load(previous)
    cur_raw, prev_raw = cur_art["queries"], prev_art["queries"]
    cur_idx, cur_seg, cur_base, cur_spread = contention(cur_art)
    prev_idx, _, prev_base, prev_spread = contention(prev_art)
    common = sorted(set(cur_raw) & set(prev_raw))
    if not common:
        print(f"bench_diff: no common queries between {current} and {previous}")
        return 0

    # Cross-run machine-speed ratio from the sentinel baselines (see
    # module docstring). 1.0 when either artifact predates the protocol
    # or the ratio is inside the cross deadband.
    cross = 1.0
    if cur_base and prev_base:
        r = cur_base / prev_base
        if not (CROSS_DEADBAND[0] <= r <= CROSS_DEADBAND[1]):
            cross = max(0.5, min(3.0, r))

    # Round-12 self-adjudication: when the current artifact carries a
    # steady re-measure for a query (Bench re-ran apparent >2x
    # regressions at the tail of the sweep), the ADJUDICATED time is the
    # comparison value — a mid-segment contention phantom adjudicates
    # itself away; a real regression reproduces in the re-run and still
    # flags. Adjudicated values are steady-state raw (no normalization).
    adjudicated = cur_art.get("adjudicated") or {}
    cur = {q: (adjudicated[q] if adjudicated.get(q)
               else cur_raw[q] / cur_idx.get(q, 1.0) / cross) for q in common}
    # An UNSTABLE previous artifact (r11 failure mode: sentinel spread
    # 4.68) cannot be deflated by its own segment indexes — dividing by a
    # contaminated 2.9x index fabricates an impossibly-fast "true" prev
    # and flags phantom regressions on every query in that segment. Use
    # the prev RAW values instead and downgrade breaches to SUSPECT.
    prev_unstable = prev_spread > SPREAD_UNSTABLE
    prev = {q: prev_raw[q] / (1.0 if prev_unstable else prev_idx.get(q, 1.0))
            for q in common}

    flagged, seg_suspect = [], []
    for q in common:
        seg = cur_seg.get(q, 1.0)
        # threshold widens with the segment's raw sentinel index — a
        # query timed on a visibly loaded segment must clear more
        if cur[q] > prev[q] * RATIO * max(1.0, seg) \
                and cur[q] - prev[q] > ABS_FLOOR:
            if seg > SEGMENT_SUSPECT:
                seg_suspect.append((cur[q] / prev[q], q, seg))
            else:
                flagged.append((cur[q] / prev[q], q, seg))
    cur_total = sum(cur.values())
    prev_total = sum(prev.values())

    print(f"bench_diff: {current} vs {previous} — {len(common)} common queries")
    for name, base, spread, art in ((current, cur_base, cur_spread, cur_art),
                                    (previous, prev_base, prev_spread, prev_art)):
        proto = art.get("protocol", "min-of-2 (pre-r9)")
        tag = " UNSTABLE" if spread > SPREAD_UNSTABLE else ""
        print(f"  {name}: protocol={proto} sentinel_baseline={base} "
              f"sentinel_spread={spread:.2f}{tag}")
    if cross != 1.0:
        tag = (" — current run ENVIRONMENT-INFLATED vs previous"
               if cross > ENV_INFLATED else "")
        print(f"  cross-run sentinel ratio: {cross:.3f} "
              f"(current baseline {cur_base}s / previous {prev_base}s){tag}")
    for q in sorted(set(adjudicated) & set(common)):
        print(f"  adjudicated {q}: raw {cur_raw[q]:.2f}s -> "
              f"steady {adjudicated[q]:.2f}s")
    # First-class adjudicated totals (round-13): the artifact carries
    # value_adjudicated = raw total with adjudicated substitutions, so
    # the honest headline never has to be recomputed from the two maps.
    for name, art in ((current, cur_art), (previous, prev_art)):
        va = art.get("value_adjudicated")
        if va is not None:
            print(f"  {name}: value={float(art.get('value', 0)):.1f}s "
                  f"value_adjudicated={float(va):.1f}s")
    raw_cur_total = sum(cur_raw[q] for q in common)
    raw_prev_total = sum(prev_raw[q] for q in common)
    print(f"  common-set total raw: {raw_prev_total:.1f}s -> "
          f"{raw_cur_total:.1f}s ({raw_cur_total / raw_prev_total:.2f}x)")
    print(f"  common-set total (contention-normalized): "
          f"{prev_total:.1f}s -> {cur_total:.1f}s "
          f"({cur_total / prev_total:.2f}x)")
    for ratio, q, seg in sorted(flagged, reverse=True):
        print(f"  REGRESSED {q}: {prev[q]:.2f}s -> {cur[q]:.2f}s ({ratio:.1f}x)"
              f" [raw {prev_raw[q]:.2f}s -> {cur_raw[q]:.2f}s,"
              f" segment contention {seg:.2f}]")
    for ratio, q, seg in sorted(seg_suspect, reverse=True):
        print(f"  SUSPECT {q}: {prev[q]:.2f}s -> {cur[q]:.2f}s ({ratio:.1f}x)"
              f" — its segment's sentinel regressed {seg:.2f}x"
              f" (> {SEGMENT_SUSPECT}); re-measure, not a gate failure")

    if prev_unstable:
        print(f"  NOTE: previous artifact is UNSTABLE (spread "
              f"{prev_spread:.2f}) — raw prev values used, breaches are "
              f"SUSPECT not FAIL")
    env_inflated = (cross > ENV_INFLATED or cur_spread > SPREAD_UNSTABLE
                    or prev_unstable)

    ok = True
    if flagged and env_inflated:
        print(f"SUSPECT: {len(flagged)} queries exceed thresholds, but the "
              f"current run is environment-inflated/unstable "
              f"(cross={cross:.2f}, spread={cur_spread:.2f}) — re-measure on "
              f"a quiet box before treating as regressions")
    elif flagged:
        print(f"FAIL: {len(flagged)} queries regressed >{RATIO}x (+>{ABS_FLOOR}s)"
              f" after contention normalization")
        ok = False
    if cur_total > prev_total * TOTAL_RATIO:
        if env_inflated:
            print(f"SUSPECT: normalized total regressed "
                  f">{int((TOTAL_RATIO-1)*100)}% on an environment-inflated "
                  f"run — re-measure on a quiet box")
        else:
            print(f"FAIL: common-set total regressed >{int((TOTAL_RATIO-1)*100)}%")
            ok = False
    if ok and not flagged:
        print("OK: no per-query or total regression")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
