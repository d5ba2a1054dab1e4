#!/usr/bin/env python3
"""Local bench regression gate.

Compares a fresh bench run (graft.Bench JSON output) against the
recorded best for the same scale factor and fails if any query exceeds
RATIO x its recorded best — catching true regressions before the
driver's round gate does, while ignoring whole-machine noise (the bench
itself already reports best-of-N per query).

Usage:
  python3 tools/bench_gate.py <current.json> [--baseline tools/bench_best.<sf>.json]
                              [--ratio 2.0] [--update]

  --update  refresh the recorded best with any query that ran FASTER
            (the baseline only ever ratchets down).
  --reset QUERY  replace QUERY's recorded best with the CURRENT
            measurement (may go UP). Only for adjudicated
            machine-drift: a best recorded in a faster machine epoch
            flags the same code forever, so prove it first by
            benching the query at the commit that recorded the best —
            identical timing there means the machine changed, not the
            code. Repeatable for multiple queries.

Exit codes: 0 ok, 1 regression, 2 usage/missing files.
"""
import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("current")
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--reset", action="append", default=[],
                    metavar="QUERY")
    args = ap.parse_args()

    with open(args.current) as f:
        cur = json.load(f)
    queries = cur.get("queries", {})
    failures = cur.get("failures", [])
    if failures:
        # a crashed query's timing is meaningless — never compare or
        # ratchet it, and fail the gate outright
        for name in failures:
            print(f"FAILED {name}: query crashed during bench")
            queries.pop(name, None)
        print(f"bench_gate: {len(failures)} crashed quer"
              f"{'y' if len(failures) == 1 else 'ies'}")
        return 1
    sf = os.path.basename(str(cur.get("sf", "unknown")))
    baseline_path = args.baseline or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"bench_best.{sf}.json")

    if not os.path.exists(baseline_path):
        with open(baseline_path, "w") as f:
            json.dump({"sf": sf, "queries": queries}, f, indent=2)
        print(f"bench_gate: recorded initial best -> {baseline_path}")
        return 0

    with open(baseline_path) as f:
        best = json.load(f)
    if os.path.basename(str(best.get("sf"))) != sf:
        print(f"bench_gate: baseline sf {best.get('sf')} != current sf {sf}; "
              "refusing cross-sf comparison", file=sys.stderr)
        return 2

    for name in args.reset:
        if name not in queries:
            print(f"bench_gate: --reset {name}: not in current run",
                  file=sys.stderr)
            return 2
        old = best["queries"].get(name)
        best["queries"][name] = queries[name]
        with open(baseline_path, "w") as f:
            json.dump(best, f, indent=2)
        print(f"bench_gate: RESET {name} best "
              f"{old if old is None else f'{old:.2f}s'} -> "
              f"{queries[name]:.2f}s (adjudicated machine drift)")

    regressions = []
    improved = {}
    for name, t in sorted(queries.items()):
        b = best["queries"].get(name)
        if b is None or b <= 0:
            improved[name] = t  # new query: record it
            continue
        if t > args.ratio * b:
            regressions.append((name, t, b))
        elif t < b:
            improved[name] = t

    for name, t, b in regressions:
        print(f"REGRESSION {name}: {t:.2f}s > {args.ratio:g}x best {b:.2f}s")
    if improved and args.update:
        best["queries"].update(improved)
        with open(baseline_path, "w") as f:
            json.dump(best, f, indent=2)
        print(f"bench_gate: ratcheted {len(improved)} best times down")

    total = sum(queries.values())
    print(f"bench_gate: {len(queries)} queries, total {total:.1f}s, "
          f"{len(regressions)} regression(s) at ratio {args.ratio:g}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
