#!/usr/bin/env python3
"""Merge N full graft.Bench runs into the published BENCH_full.json.

Usage: tools/bench_merge.py run1.json run2.json [...] > BENCH_full.json

Per-query value = MIN over the runs (a real regression repeats; JIT/GC
variance doesn't, so round-over-round comparisons read the stable floor
— the same rule Bench.scala applies to its own in-run repeats). An
intermittent regression would hide under the min, so "value_median" /
"queries_median" (per-query lower median over the runs) ride alongside;
compare rounds on BOTH. The raw per-run totals ride in "note"; the
in-run "repeats" field is dropped because its pairs describe ONE run
and would contradict cross-run minima.
"""
import json
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "pass at least one run file"
# union of boards: a query added mid-capture rides only the runs that
# have it — every key must appear in at least one run
keys = sorted(set(k for r in runs for k in r["queries"]))
qs = {k: min(r["queries"][k] for r in runs if k in r["queries"])
      for k in keys}


def lower_median(xs):
    xs = sorted(xs)
    return xs[(len(xs) - 1) // 2]


# A run where the query FAILED contributes +inf to its median (absence
# from a run's board entirely — mid-capture growth — contributes
# nothing): a query that failed in most runs must not present its lone
# success as "the median", which is exactly the intermittent case this
# field exists to expose. An infinite median lands the query in "flaky"
# instead of queries_median.
qs_med_all = {
    k: lower_median(
        [r["queries"][k] for r in runs if k in r["queries"]] +
        [float("inf") for r in runs if k in r.get("failed", [])])
    for k in keys}
qs_med = {k: v for k, v in qs_med_all.items() if v != float("inf")}
flaky = sorted(k for k, v in qs_med_all.items() if v == float("inf"))
# a query that succeeded in ANY run is not "failed" — listing it in both
# maps would make the published file self-contradictory
failed = sorted(
    set(f for r in runs for f in r.get("failed", [])) - set(qs))
merged = {
    "metric": "total",
    "value": sum(qs.values()),
    "value_median": sum(qs_med.values()),
    "unit": "sec",
    "queries": qs,
    "queries_median": qs_med,
    "failed": failed,
    "flaky": flaky,
    "sf": runs[0]["sf"],
    "note": "per-query MIN over %d full clean-machine runs (totals %s); "
            "value_median sums per-query lower medians with failed runs "
            "counted as +inf (majority-failed queries move to 'flaky'); "
            "compare rounds on shared query keys only"
            % (len(runs), ", ".join("%.1f" % r["value"] for r in runs)),
}
json.dump(merged, sys.stdout)
