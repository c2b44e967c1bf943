#!/usr/bin/env python3
"""Aggregate N full-bench JSON lines (graft.Bench stdout) into the per-round
BENCH_FULL_r{N}.json artifact: per-query min/median over runs + run totals.
Usage: bench_agg.py OUT_JSON ROUND RUN_JSON..."""
import json, statistics, sys

def main():
    out, rnd, runs = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    per, totals, sf = {}, [], None
    ctls = {}
    for path in runs:
        # sbt may prefix the metric line with "[info] " and append trailing
        # log lines — parse line by line, keeping the first line that is
        # valid JSON from its first brace; skip files with none
        d = None
        with open(path) as f:
            for line in f:
                brace = line.find("{")
                if brace < 0:
                    continue
                try:
                    d = json.loads(line[brace:])
                except json.JSONDecodeError:
                    continue
                if isinstance(d, dict) and "queries" in d:
                    break
                d = None
        if d is None:
            print(f"skip (no bench JSON line) {path}", file=sys.stderr)
            continue
        sf = d.get("sf", sf)
        totals.append(round(d["value"], 1))
        for q, s in d["queries"].items():
            per.setdefault(q, []).append(s)
        for c, s in d.get("controls", {}).items():
            ctls.setdefault(c, []).append(s)
    qmap = {q: {"min": round(min(v), 3), "median": round(statistics.median(v), 3),
                "runs": len(v)} for q, v in sorted(per.items())}
    cmap = {c: {"min": round(min(v), 3), "median": round(statistics.median(v), 3),
                "runs": len(v)} for c, v in sorted(ctls.items())}
    doc = {"round": rnd, "sf": sf, "n_queries": len(qmap),
           "run_totals_sec": totals,
           "controls": cmap,
           "total_of_per_query_min": round(sum(x["min"] for x in qmap.values()), 1),
           "total_of_per_query_median": round(sum(x["median"] for x in qmap.values()), 1),
           "queries": qmap}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {len(qmap)} queries, totals {totals}, "
          f"sum-min {doc['total_of_per_query_min']}s")

if __name__ == "__main__":
    main()
