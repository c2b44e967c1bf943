#!/usr/bin/env python3
"""Aggregate N full-bench JSON lines (graft.Bench stdout) into the per-round
BENCH_FULL_r{N}.json artifact: per-query min/median over runs + run totals.
Usage: bench_agg.py OUT_JSON ROUND RUN_JSON...

Compare mode (round-over-round with CONTROL-NORMALIZED ratios):
    bench_agg.py --compare OLD_FULL_JSON NEW_FULL_JSON [ratio_threshold]
Prints a markdown table: per-query raw min-ratio new/old plus the ratio
normalized by each calibration control's own min-ratio (ctl_scan /
ctl_shuffle / ctl_loop) — a query is host-attributed when its raw ratio
tracks the control of its regime, engine-attributed when the normalized
ratio stays off 1.0. Only rows with |raw-1| >= threshold (default 0.15)
print; the summary always does."""
import json, statistics, sys


def compare(old_path, new_path, thresh=0.15):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    octl, nctl = old.get("controls", {}), new.get("controls", {})
    regimes = sorted(set(octl) & set(nctl))
    cratio = {c: new["controls"][c]["min"] / old["controls"][c]["min"]
              for c in regimes}
    common = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for q in common:
        o, n = old["queries"][q]["min"], new["queries"][q]["min"]
        raw = n / o
        rows.append((q, o, n, raw, {c: raw / cratio[c] for c in regimes}))
    osum = sum(old["queries"][q]["min"] for q in common)
    nsum = sum(new["queries"][q]["min"] for q in common)
    print(f"common queries: {len(common)}  sum-of-min {osum:.1f}s -> {nsum:.1f}s "
          f"(raw ratio {nsum / osum:.3f})")
    print("controls (min new/old): " + "  ".join(
        f"{c}={cratio[c]:.3f}" for c in regimes))
    med = statistics.median(r[3] for r in rows)
    print(f"per-query raw min-ratio median {med:.3f}")
    hdr = "| query | old min | new min | raw |" + "".join(
        f" /{c.replace('ctl_', '')} |" for c in regimes)
    print("\n" + hdr)
    print("|---|---|---|---|" + "---|" * len(regimes))
    for q, o, n, raw, norm in sorted(rows, key=lambda r: -r[3]):
        if abs(raw - 1) < thresh:
            continue
        cells = "".join(f" {norm[c]:.2f} |" for c in regimes)
        print(f"| {q} | {o:.2f} | {n:.2f} | {raw:.2f} |{cells}")


if len(sys.argv) > 1 and sys.argv[1] == "--compare":
    compare(sys.argv[2], sys.argv[3],
            float(sys.argv[4]) if len(sys.argv) > 4 else 0.15)
    sys.exit(0)

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
