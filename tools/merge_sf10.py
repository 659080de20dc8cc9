#!/usr/bin/env python3
"""Merge two BenchScaled runs (the ~sf1 and ~sf10 dirs) into the
BENCH_sf10.json scale-probe artifact, with the round-16 additions:

  - calibration: each run carries fixed-work cpu/shuffle/mem/disk
    probes (before + after); the per-component ratio between the two
    runs measures how much of a target's ratio is MACHINE, not data.
    ratio_norm = ratio_10x / calib_work, where calib_work is the
    geometric mean of the component ratios — a target whose normalized
    ratio is ~sublinear scaled fine on a slower machine.
  - build/query phase split: lake scenario targets decompose into
    ingest (build) and scan (query) seconds per side.

Usage: merge_sf10.py <sf1.json> <sf10.json> <out.json> [description]
"""
import json
import math
import sys


def calib(run):
    b, a = run.get("calib_before", {}), run.get("calib_after", {})
    out = {}
    for k in set(b) | set(a):
        vals = [v for v in (b.get(k), a.get(k)) if v is not None]
        out[k] = sum(vals) / len(vals)
    return out


def main():
    sf1 = json.load(open(sys.argv[1]))
    sf10 = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    desc = sys.argv[4] if len(sys.argv) > 4 else ""

    c1, c10 = calib(sf1), calib(sf10)
    calib_ratio = {k: round(c10[k] / c1[k], 3) for k in c1 if k in c10 and c1[k] > 0}
    work = math.exp(sum(math.log(v) for v in calib_ratio.values())
                    / len(calib_ratio)) if calib_ratio else 1.0

    q1, q10 = sf1["queries"], sf10["queries"]
    ratio, ratio_norm = {}, {}
    for k in q10:
        if k in q1 and q1[k] > 0 and q10[k] >= 0:
            r = q10[k] / q1[k]
            ratio[k] = round(r, 2)
            ratio_norm[k] = round(r / work, 2)

    def phases(run):
        b, q = run.get("queries_build", {}), run.get("queries_query", {})
        return {k: {"build": b.get(k), "query": q.get(k)}
                for k in b if k.startswith("lake_")}

    out = {
        "metric": "sf10_probe",
        "description": desc,
        "calib_sf1": {k: round(v, 3) for k, v in c1.items()},
        "calib_sf10": {k: round(v, 3) for k, v in c10.items()},
        "calib_ratio": calib_ratio,
        "calib_work": round(work, 3),
        "sf1_sec": q1,
        "sf10_sec": q10,
        "ratio_10x": ratio,
        "ratio_10x_norm": ratio_norm,
        "lake_phases_sf1": phases(sf1),
        "lake_phases_sf10": phases(sf10),
        # round-17: MoR read-cost attribution — live tombstone counts,
        # pre/post-maintenance query seconds, and the maintenance cost
        # itself, per scale (the claim: post-compaction reads return to
        # the flat tombstone-free cost)
        "mor_probe_sf1": sf1.get("mor_probe"),
        "mor_probe_sf10": sf10.get("mor_probe"),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    worst = sorted(ratio_norm.items(), key=lambda kv: -kv[1])[:8]
    print(f"calib_ratio={calib_ratio} work={work:.3f}")
    print("worst normalized ratios:")
    for k, v in worst:
        print(f"  {k:35s} raw={ratio[k]:6.2f} norm={v:6.2f}")


if __name__ == "__main__":
    main()
