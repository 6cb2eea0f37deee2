#!/usr/bin/env python3
"""Bench-stability guard (driver-side tooling, stdlib only).

Round 3 shipped on two lucky bench runs while the same build swung 47x
under the driver's harness. This guard makes that impossible to miss:
it compares per-query timings across the most recent bench runs in
docs/bench_history.jsonl and FAILS (exit 1) if any query moved more
than --max-ratio between runs. Run it after `sbt "runMain graft.Bench"`
on unchanged code; a failure means a plan is load/cache-state-sensitive
and must be pinned structurally before the round ships.

Usage:
  python3 tools/bench_guard.py              # compare last 2 runs
  python3 tools/bench_guard.py --last 5     # pairwise across last 5
  python3 tools/bench_guard.py --max-ratio 2.5 --min-sec 1.0
"""
import argparse
import json
import sys


def load_runs(path, n):
    runs = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                bench = rec.get("bench", rec)
                if "queries" in bench:
                    runs.append((rec.get("at", 0), bench))
    except FileNotFoundError:
        sys.exit(f"bench_guard: no history at {path}; run graft.Bench first")
    return runs[-n:]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--history", default="docs/bench_history.jsonl")
    p.add_argument("--last", type=int, default=2,
                   help="number of most-recent runs to compare")
    p.add_argument("--max-ratio", type=float, default=2.5,
                   help="fail if any query's max/min across runs exceeds this")
    p.add_argument("--expensive-ratio", type=float, default=1.75,
                   help="tighter ratio for queries whose MIN timing is >= "
                        "--expensive-sec (mirrors Bench's tiered in-run "
                        "tripwire: multi-second queries drift loudly)")
    p.add_argument("--expensive-sec", type=float, default=3.0,
                   help="min timing above which --expensive-ratio applies")
    p.add_argument("--min-sec", type=float, default=1.0,
                   help="ignore queries whose max timing is below this "
                        "(sub-second timings are scheduler noise)")
    args = p.parse_args()

    runs = load_runs(args.history, args.last * 4)
    # compare only runs against the SAME corpus as the latest run: the
    # driver regenerates testdata between rounds, and cross-corpus
    # ratios measure the data change, not plan stability (mirrors
    # Bench's corpus-tagged in-run medians). Untagged (pre-tagging)
    # records only compare with other untagged ones.
    if runs:
        cur = runs[-1][1].get("corpus")
        runs = [r for r in runs if r[1].get("corpus") == cur][-args.last:]
    if len(runs) < 2:
        sys.exit("bench_guard: need at least 2 same-corpus bench runs "
                 "in history")

    names = set()
    for _, b in runs:
        names.update(b["queries"])
    bad = []
    for name in sorted(names):
        ts = [b["queries"][name] for _, b in runs
              if name in b["queries"] and b["queries"][name] > 0]
        if len(ts) < 2 or max(ts) < args.min_sec:
            continue
        ratio = max(ts) / max(min(ts), 1e-9)
        limit = (args.expensive_ratio if min(ts) >= args.expensive_sec
                 else args.max_ratio)
        if ratio > limit:
            bad.append((ratio, name, ts))

    totals = [b.get("value") for _, b in runs]
    print(f"bench_guard: {len(runs)} runs, totals = "
          + ", ".join(f"{t:.1f}s" for t in totals))
    if bad:
        print(f"bench_guard: FAIL — {len(bad)} quer"
              f"{'y' if len(bad) == 1 else 'ies'} moved past the tiered "
              f"limit ({args.expensive_ratio}x at >= {args.expensive_sec}s, "
              f"else {args.max_ratio}x) across runs of the same build:")
        for ratio, name, ts in sorted(bad, reverse=True):
            print(f"  {name}: {ratio:.1f}x  "
                  + " / ".join(f"{t:.1f}s" for t in ts))
        sys.exit(1)
    print(f"bench_guard: OK — no query moved past the tiered limit "
          f"({args.expensive_ratio}x at >= {args.expensive_sec}s, else "
          f"{args.max_ratio}x; min considered {args.min_sec}s)")


if __name__ == "__main__":
    main()
