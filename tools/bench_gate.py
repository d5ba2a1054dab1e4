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

NOISE HANDLING (round-14 hardening; rounds 11-13 produced 10/6/16
ratio-only false alarms, every one adjudicated as machine co-tenancy):
  1. ABSOLUTE FLOOR — a flag needs a meaningful absolute delta, not
     just a ratio over a sub-second best: t - best > max(FLOOR,
     0.5*best) (after drift scaling), so 0.10s -> 0.22s never flags.
  2. DRIFT NORMALIZATION — machine contention is GLOBAL, code
     regressions are LOCAL: the median of t/best across a full run of
     byte-identical code measures the machine, so bests are scaled by
     median(t/best) (when >= MIN_DRIFT_SAMPLES comparisons; never
     below 1.0) before the ratio test.
  3. CONTENDED-RUN DEMOTION — when the run is measurably contended
     (drift > DRIFT_SUSPECT), residual flags are printed as SUSPECT
     and the gate exits 0: inside a drifted run no per-query statistic
     separates a 5x contention spike from a 5x regression, so the
     verdict defers to a quiet re-measure (the documented workflow).
     A quiet run (drift <= DRIFT_SUSPECT) still hard-fails.
  Limitation (accepted): a code change slowing EVERY query uniformly
  is indistinguishable from machine drift by timing alone — the
  committed quiet full-registry artifact is the guard for that case.

Usage:
  python3 tools/bench_gate.py <current.json> [--baseline tools/bench_best.<sf>.json]
                              [--ratio 2.0] [--floor 1.0] [--update]

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
import statistics
import sys

FULL_FRACTION = 0.9
# minimum (query, best) comparisons before the run's median t/best is
# trusted as a machine-drift estimate — a 3-query focused re-measure
# cannot estimate the machine, a 200-query registry run can
MIN_DRIFT_SAMPLES = 20
# a run whose median t/best exceeds this is contended: residual flags
# demote to SUSPECT (exit 0) pending a quiet re-measure
DRIFT_SUSPECT = 1.25


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
    ap.add_argument("--floor", type=float, default=1.0,
                    help="minimum absolute regression in seconds")
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

    # context of THIS run: full-registry or focused re-measure. The
    # run's own "registry" field (the count of REGISTERED queries,
    # emitted by graft.Bench regardless of any name filter) is
    # authoritative; the legacy fallback classifies against
    # baseline ∪ current names, which misreads a full run as focused
    # once enough baseline names go stale (renamed/removed queries
    # are never pruned from the baseline).
    registry = cur.get("registry")
    if isinstance(registry, (int, float)) and registry > 0:
        ctx = "full" if len(queries) >= FULL_FRACTION * registry \
            else "focused"
    else:
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

    def best_for(name):
        slot = best["queries"].get(name, {})
        b = slot.get(ctx)
        if ctx == "focused" and b is None:
            # quieter setting: a full-context best still bounds it
            b = slot.get("full")
        return b

    # machine-drift estimate: the median t/best over this run's
    # comparable queries (contention is global, regressions are local
    # — one slow query barely moves a 200-sample median). Never < 1.0:
    # a fast run must not tighten the gate below the recorded bests.
    drift_ratios = [t / best_for(n) for n, t in queries.items()
                    if best_for(n)]
    drift = 1.0
    if len(drift_ratios) >= MIN_DRIFT_SAMPLES:
        drift = max(1.0, statistics.median(drift_ratios))

    regressions = []
    improved = {}
    for name, t in sorted(queries.items()):
        slot = best["queries"].get(name, {})
        b = best_for(name)
        if b is None or b <= 0:
            improved[name] = t  # new query/context: record it
            continue
        scaled = b * drift
        if t > args.ratio * scaled and \
                t - scaled > max(args.floor, 0.5 * scaled):
            regressions.append((name, t, b))
        elif t < slot.get(ctx, float("inf")):
            improved[name] = t

    # a measurably contended run cannot adjudicate its own flags: no
    # per-query statistic separates a contention spike from a true
    # regression when the whole machine reads slow — demote to SUSPECT
    # and require the quiet re-measure the workflow already prescribes
    suspect_only = drift > DRIFT_SUSPECT
    for name, t, b in regressions:
        kind = "SUSPECT" if suspect_only else "REGRESSION"
        print(f"{kind} {name}: {t:.2f}s > {args.ratio:g}x best {b:.2f}s "
              f"(drift-scaled {b * drift:.2f}s) [{ctx}]" +
              (" — contended run: re-measure quietly before adjudicating"
               if suspect_only else ""))
    if improved and args.update:
        for name, t in improved.items():
            best["queries"].setdefault(name, {})[ctx] = t
        save_baseline(baseline_path, best)
        print(f"bench_gate: ratcheted {len(improved)} {ctx} best times down")

    total = sum(queries.values())
    print(f"bench_gate: {len(queries)} queries ({ctx} context), "
          f"total {total:.1f}s, machine drift {drift:.2f}x, "
          f"{len(regressions)} flag(s) at ratio {args.ratio:g} "
          f"floor {args.floor:g}s"
          + (" — all SUSPECT (contended run), not gating"
             if regressions and suspect_only else ""))
    return 1 if regressions and not suspect_only else 0


if __name__ == "__main__":
    sys.exit(main())
