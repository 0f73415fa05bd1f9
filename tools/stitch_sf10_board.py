#!/usr/bin/env python3
"""Stitch the round-11 full sf10 board from its two legs:

  1. the full-board run whose JVM died at 248/296 on the default 8 GiB
     sbt heap (per-query cold/warm recovered from the progress log), and
  2. the 50-query completion run (the un-run tail + the two 8 GiB
     failures) on the rehearsal-standard 96 GiB heap.

Usage: python3 tools/stitch_sf10_board.py <first_run.log> <tail_bench.json> <out.json>

Queries present in BOTH legs keep the tail run's number (bigger heap =
the methodology the committed rehearsals use). Emits a Bench-shaped
JSON so tools/scaling.py can consume it directly.
"""
import sys, json, re

def main(log_path, tail_path, out_path):
    qs = {}
    for m in re.finditer(r"\[bench\] done  (\S+) cold=([\d.]+) warm=([\d.]+)",
                         open(log_path).read()):
        qs[m.group(1)] = {"cold": float(m.group(2)), "warm": float(m.group(3))}
    # the 8 GiB leg's failures carry bogus ~0s times — drop before overlay
    failed = set(re.findall(r"\[bench\] (\S+) failed:", open(log_path).read()))
    for bad in failed:
        qs.pop(bad, None)
    tail = json.load(open(tail_path))
    qs.update(tail["queries"])
    # a failed-leg query absent from the tail would silently vanish while
    # the output still reads as a complete board — abort instead
    lost = sorted(failed - set(qs))
    if lost:
        sys.exit(f"ABORT: queries failed in the first leg and absent from "
                 f"the tail run: {lost}")
    out = {"metric": "total_query_time",
           "value": round(sum(v["warm"] for v in qs.values()), 3),
           "unit": "sec",
           "total_cold": round(sum(v["cold"] for v in qs.values()), 3),
           "sf": tail["sf"], "queries": qs,
           "note": "stitched: 8g-heap full run (died at 248/296) + 96g tail"}
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(qs)} queries, warm total {out['value']}")

if __name__ == "__main__":
    main(*sys.argv[1:4])
