#!/usr/bin/env python3
"""Spread-gated cross-round bench comparison.

Usage: python3 tools/bench_compare.py <prev-detail.json> <cur-detail.json>

Reads two bench-detail files (written by graft.Bench: detail line first,
headline line second) and reports ONLY spread-cleared per-query deltas —
the round-7 verdict's gating rule, in both directions:

  regression : min_cur > median_prev * spread_prev   (cur is slower than
               anything the prev round's own noise produced)
  improvement: min_prev > median_cur * spread_cur

Everything else is inside at least one round's own min/median/spread
noise floor and is reported as a single count, not attributed. The
comparison refuses to run across different fixture fingerprints — a
regenerated fixture produces phantom deltas (the round-4 lesson).
"""
import json
import sys


def load(path):
    with open(path) as f:
        lines = [json.loads(l) for l in f.read().strip().split("\n")]
    detail = next((l for l in lines if l.get("detail")), {})
    headline = next((l for l in lines if "value" in l), {})
    fp = detail.get("fixture_fp") or headline.get("fixture_fp")
    return detail.get("queries_stats", {}), fp, headline, detail


def contention(headline, detail):
    """(flag, description) from whichever line carries the signals."""
    src = {**detail, **headline}
    flagged = (src.get("contended") is True
               or src.get("median_spread", 1.0) > 2.0
               or src.get("pre_load", 0.0) > 4.0
               or src.get("steal_pct", 0.0) > 10.0)
    desc = (f"contended={src.get('contended')} "
            f"median_spread={src.get('median_spread')} "
            f"pre_load={src.get('pre_load')} "
            f"steal_pct={src.get('steal_pct')}")
    return flagged, desc


def main(prev_path, cur_path):
    prev, fp_prev, head_prev, det_prev = load(prev_path)
    cur, fp_cur, head_cur, det_cur = load(cur_path)
    if not prev or not cur:
        sys.exit("missing queries_stats in one of the inputs "
                 "(pre-round-7 detail files have none)")
    if fp_prev and fp_cur and fp_prev != fp_cur:
        sys.exit(f"fixture fingerprints differ ({fp_prev} vs {fp_cur}) — "
                 "per-query deltas would be fixture artifacts, refusing")
    # contention is the other phantom-delta source the detail line now
    # records — a contended side makes every delta suspect even when it
    # clears the spread gate (steady steal inflates all runs uniformly,
    # leaving the spread at 1)
    for tag, (h, d) in (("prev", (head_prev, det_prev)),
                        ("cur", (head_cur, det_cur))):
        flagged, desc = contention(h, d)
        if flagged:
            print(f"WARNING: {tag} run is contention-flagged ({desc}) — "
                  "deltas below are suspect in BOTH directions")
    shared = sorted(set(prev) & set(cur))
    reg, imp, noise = [], [], 0
    for q in shared:
        p, c = prev[q], cur[q]
        if c["min"] > p["median"] * p["spread"]:
            reg.append((c["min"] / p["min"], q, p, c))
        elif p["min"] > c["median"] * c["spread"]:
            imp.append((p["min"] / c["min"], q, p, c))
        else:
            noise += 1
    for title, rows in (("REGRESSIONS (cleared prev spread)", reg),
                        ("improvements (cleared cur spread)", imp)):
        print(f"== {title}: {len(rows)}")
        for ratio, q, p, c in sorted(rows, reverse=True):
            print(f"  {q}: {p['min']:.3f}s -> {c['min']:.3f}s "
                  f"({ratio:.2f}x; prev med {p['median']:.3f} "
                  f"spread {p['spread']:.2f}, cur med {c['median']:.3f} "
                  f"spread {c['spread']:.2f})")
    print(f"== inside noise floors: {noise} of {len(shared)} shared; "
          f"only-prev {sorted(set(prev) - set(cur))} "
          f"only-cur {sorted(set(cur) - set(prev))}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
