#!/usr/bin/env python3
"""The ONE standing scaling report (VERDICT r11 ask #7).

Folds the three measured decades (sf0.01->sf0.1, sf0.1->sf1, sf1->sf10)
into reports/scaling.json, with every >FLAG ratio either absent or
carrying an embedded adjudication from tools/adjudications.json (solo
re-profile verdicts, leg decompositions, plan-transition attributions —
the r10/r11 lesson: full-board flags are usually interleave noise, so a
flag without a solo verdict is just a to-do, not a finding).

Usage:
  python3 tools/standing_scaling.py \
    reports/bench_sf001.json reports/bench_full.json \
    reports/bench_sf1.json reports/bench_sf10.json

Replaces the per-round scaling_r*.json / scaling_sf10_r*.json forks.
Exits nonzero if a flagged query has no adjudication entry.
"""
import sys, json, os

FLAG = 10.0

def t_of(v):
    return v["warm"] if isinstance(v, dict) else v

# A t_small of 0 makes the ratio undefined, not innocent: if the large
# leg is above this floor the query still needs a look (the old form gave
# it ratio None and a permanent pass).
ZERO_SMALL_FLOOR = 5.0

# Box-epoch comparability (VERDICT r13 ask #2): each board records a pinned
# CPU+disk calibration probe (Bench.epochProbe) in its sidecar. If two legs'
# probes differ by more than the component's tolerance, the pair is a
# CROSS-EPOCH comparison — the r13 "249.7 vs 202.8 s on identical code"
# class — and the decade's totals carry that caveat as data, not prose.
# Tolerances are set from measured idle-box repeatability (min-of-N probe
# reps): CPU resolves to ±0.5%, so 10% is a decisive epoch signal; the
# virtualized disk only resolves to ~±11% even at min-of-3, so its
# threshold sits above that noise floor (the real write-back epochs the
# sf10 boards hit were 60%+). Informational (printed + embedded), never an
# exit failure: a slow box is a measurement condition, not an
# unadjudicated finding.
EPOCH_TOL = {"cpu_sec": 0.10, "disk_sec": 0.25}

def epoch_cmp(small, large):
    es, el = small.get("epoch_probe"), large.get("epoch_probe")
    if not es or not el:
        return {"comparable": False,
                "reason": "epoch probe missing on at least one board (pre-r14 sidecar)"}
    out = {"comparable": True, "small": es, "large": el,
           "cross_epoch": False, "components": {}}
    for k, tol in EPOCH_TOL.items():
        a, b = es.get(k), el.get(k)
        if not a or not b or a <= 0:
            continue
        r = round(b / a, 3)
        flag = abs(r - 1.0) > tol
        out["components"][k] = {"ratio": r, "tolerance": tol, "flag": flag}
        if flag:
            out["cross_epoch"] = True
    return out

def decade(small_path, large_path):
    small, large = json.load(open(small_path)), json.load(open(large_path))
    qs = {}
    for k in sorted(small["queries"]):
        b = large["queries"].get(k)
        if b is None:
            continue
        a, b = t_of(small["queries"][k]), t_of(b)
        qs[k] = {"t_small": a, "t_large": b,
                 "ratio": round(b / a, 2) if a > 0 else None}
    flagged = sorted([k for k, v in qs.items()
                      if v["ratio"] and v["ratio"] > FLAG],
                     key=lambda k: -qs[k]["ratio"])
    # ratio-less zero-small queries with real large-leg cost are flags too
    flagged += sorted([k for k, v in qs.items()
                       if v["ratio"] is None and v["t_large"] > ZERO_SMALL_FLOOR],
                      key=lambda k: -qs[k]["t_large"])
    return {
        "legs": {"small": small_path, "large": large_path},
        "sf_small": small["sf"], "sf_large": large["sf"],
        "n_queries": len(qs),
        # board totals: each leg's FULL query set (the headline number) AND
        # the intersected set (the only pair comparable when boards diverge)
        "total_small": round(sum(t_of(v) for v in small["queries"].values()), 1),
        "total_large": round(sum(t_of(v) for v in large["queries"].values()), 1),
        "total_small_common": round(sum(v["t_small"] for v in qs.values()), 1),
        "total_large_common": round(sum(v["t_large"] for v in qs.values()), 1),
        "epoch": epoch_cmp(small, large),
        "flagged": flagged,
        "queries": qs,
    }

def main():
    paths = sys.argv[1:5]
    if len(paths) != 4:
        sys.exit(__doc__)
    adj_path = os.path.join(os.path.dirname(__file__), "adjudications.json")
    adjudications = json.load(open(adj_path)) if os.path.exists(adj_path) else {}
    decades = {
        "sf0.01_to_sf0.1": decade(paths[0], paths[1]),
        "sf0.1_to_sf1":    decade(paths[1], paths[2]),
        "sf1_to_sf10":     decade(paths[2], paths[3]),
    }
    missing = []
    for dk, d in decades.items():
        d["adjudications"] = {}
        for q in d["flagged"]:
            if q in adjudications:
                d["adjudications"][q] = adjudications[q]
            else:
                # zero-small flags have ratio None by construction; show the
                # large-leg time that triggered them instead of "Nonex"
                qd = d["queries"][q]
                ev = (f"{qd['ratio']}x" if qd["ratio"] is not None
                      else f"t_small=0, t_large={qd['t_large']}s")
                missing.append(f"{dk}: {q} ({ev})")
    out = {"flag_threshold": FLAG,
           "method": "per-query warm ratios on ~10x data per decade; any "
                     ">10x full-board flag must be solo re-profiled "
                     "(SPARK_GRAFT_ONLY, own JVM, min-of-2 warm) before it "
                     "counts — adjudications carry those verdicts",
           "decades": decades}
    with open("reports/scaling.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    # per-board epoch probes, once each (the four sidecars in chain order)
    for p in paths:
        probe = json.load(open(p)).get("epoch_probe")
        if probe:
            print(f"epoch_probe {p}: cpu={probe.get('cpu_sec')}s"
                  f" disk={probe.get('disk_sec')}s")
        else:
            print(f"epoch_probe {p}: (none — pre-r14 sidecar)")
    for dk, d in decades.items():
        print(f"{dk}: {d['n_queries']} queries, total {d['total_small']}"
              f" -> {d['total_large']} s, flagged {d['flagged']}")
        e = d["epoch"]
        if e.get("cross_epoch"):
            comps = ", ".join(
                f"{k} {v['ratio']}x (tol ±{int(v['tolerance']*100)}%)"
                for k, v in e["components"].items() if v["flag"])
            print(f"  CROSS-EPOCH: probe ratio outside tolerance ({comps})"
                  f" — totals not directly comparable across these boards")
    if missing:
        sys.exit("UNADJUDICATED FLAGS:\n" + "\n".join(missing))
    print("wrote reports/scaling.json (all flags adjudicated)")

if __name__ == "__main__":
    main()
