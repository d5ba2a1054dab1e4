#!/usr/bin/env python3
"""Local bench regression gate.

Compares a fresh bench run (graft.Bench JSON output) against the
recorded best for the same scale factor and fails if any query exceeds
RATIO x its recorded best — catching true regressions before the
driver's round gate does, while ignoring whole-machine noise (the bench
itself already reports best-of-N per query).

MEASUREMENT CONTEXT (round-13 hardening): a query measured in a
focused run (a fresh JVM benching a handful of queries) is
systematically faster than the same query measured mid-way through a
full-registry session — rounds 11/12 proved per-query swings of 2-5x
on byte-identical code, and focused-run bests planted into a flat
baseline flagged full runs forever. Each best is therefore recorded
UNDER ITS CONTEXT ("full" = the run covered >= FULL_FRACTION of the
known registry, "focused" otherwise) and a run is only gated against
bests measured in the SAME context — except that a focused current
run may fall back to a full best (focused is the quieter setting, so
exceeding 2x a full-context best is a genuine regression), while a
full run is NEVER compared against a focused best (the direction that
cried wolf).

Usage:
  python3 tools/bench_gate.py <current.json> [--baseline tools/bench_best.<sf>.json]
                              [--ratio 2.0] [--update]

  --update  refresh the recorded best (in the run's context slot) with
            any query that ran FASTER (each slot only ever ratchets
            down).
  --reset QUERY  replace QUERY's recorded best IN THE CURRENT RUN'S
            CONTEXT with the current measurement (may go UP). Only for
            adjudicated machine-drift: a best recorded in a faster
            machine epoch flags the same code forever, so prove it
            first by re-benching quietly — identical timing across
            reps means the machine/harness changed, not the code.
            Repeatable for multiple queries.

Baseline file format (auto-migrated from the legacy flat form):
  {"sf": "sf0.1", "queries": {"q01": {"full": 0.24, "focused": 0.18}}}
Legacy flat floats are migrated into the "focused" slot — they are
fastest-ever-seen values of unknowable provenance, valid only as the
quiet-run bound; the first full-registry run after migration records
the "full" slot for every query.

Exit codes: 0 ok, 1 regression, 2 usage/missing files.
"""
import argparse
import json
import os
import sys

FULL_FRACTION = 0.9


def load_baseline(path):
    with open(path) as f:
        best = json.load(f)
    migrated = False
    for name, v in list(best.get("queries", {}).items()):
        if not isinstance(v, dict):  # legacy flat float
            best["queries"][name] = {"focused": v}
            migrated = True
    return best, migrated


def save_baseline(path, best):
    with open(path, "w") as f:
        json.dump(best, f, indent=2, sort_keys=True)
        f.write("\n")


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
        save_baseline(baseline_path,
                      {"sf": sf,
                       "queries": {n: {"full": t}
                                   for n, t in queries.items()}})
        print(f"bench_gate: recorded initial best -> {baseline_path}")
        return 0

    best, migrated = load_baseline(baseline_path)
    if os.path.basename(str(best.get("sf"))) != sf:
        print(f"bench_gate: baseline sf {best.get('sf')} != current sf {sf}; "
              "refusing cross-sf comparison", file=sys.stderr)
        return 2
    if migrated:
        save_baseline(baseline_path, best)
        print("bench_gate: migrated legacy flat baseline -> context slots "
              "(legacy values recorded as 'focused' bests)")

    # context of THIS run: full-registry or focused re-measure
    known = set(best["queries"]) | set(queries)
    ctx = "full" if known and len(queries) >= FULL_FRACTION * len(known) \
        else "focused"

    for name in args.reset:
        if name not in queries:
            print(f"bench_gate: --reset {name}: not in current run",
                  file=sys.stderr)
            return 2
        slot = best["queries"].setdefault(name, {})
        old = slot.get(ctx)
        slot[ctx] = queries[name]
        save_baseline(baseline_path, best)
        print(f"bench_gate: RESET {name} {ctx} best "
              f"{old if old is None else f'{old:.2f}s'} -> "
              f"{queries[name]:.2f}s (adjudicated machine drift)")

    regressions = []
    improved = {}
    for name, t in sorted(queries.items()):
        slot = best["queries"].get(name, {})
        b = slot.get(ctx)
        if ctx == "focused" and b is None:
            # quieter setting: a full-context best still bounds it
            b = slot.get("full")
        if b is None or b <= 0:
            improved[name] = t  # new query/context: record it
            continue
        if t > args.ratio * b:
            regressions.append((name, t, b))
        elif t < slot.get(ctx, float("inf")):
            improved[name] = t

    for name, t, b in regressions:
        print(f"REGRESSION {name}: {t:.2f}s > {args.ratio:g}x best {b:.2f}s "
              f"[{ctx}]")
    if improved and args.update:
        for name, t in improved.items():
            best["queries"].setdefault(name, {})[ctx] = t
        save_baseline(baseline_path, best)
        print(f"bench_gate: ratcheted {len(improved)} {ctx} best times down")

    total = sum(queries.values())
    print(f"bench_gate: {len(queries)} queries ({ctx} context), "
          f"total {total:.1f}s, "
          f"{len(regressions)} regression(s) at ratio {args.ratio:g}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
