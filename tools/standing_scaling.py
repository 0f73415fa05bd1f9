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

  # same-SF board pair (cross-round / driver-vs-builder), VERDICT r14
  # asks #1b+#5: probe-normalized ratios + the >1.15x same-code
  # board-divergence transfer check (flags even when probes agree)
  python3 tools/standing_scaling.py --cross-round \
    <sidecarA.json> <sidecarB.json> [--out reports/cross_round.json] \
    [--bands reports/face_bands_sf01.json] \
    [--tolerances reports/epoch_tolerances.json]

  # per-face empirical variance bands (VERDICT r15 ask #1): observed
  # max/min warm swing per face across N same-code same-SF sidecars,
  # consumed by --cross-round --bands in place of the flat 2x face cut
  python3 tools/standing_scaling.py --face-bands \
    <sidecar1.json> <sidecar2.json> [...] --out reports/face_bands_sf01.json

  # ledger-derived probe tolerances (VERDICT r15 ask #4): per-leg idle
  # bands from reports/epoch_ledger.jsonl, consumed by --cross-round
  # --tolerances in place of the hand-pinned EPOCH_TOL constants
  python3 tools/standing_scaling.py --ledger-bands \
    reports/epoch_ledger.jsonl --out reports/epoch_tolerances.json

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

# Box-epoch comparability (VERDICT r13 ask #2; legs widened per r14 ask
# #1): each board records a pinned calibration probe (Bench.epochProbe) in
# its sidecar. If two legs' probes differ by more than the component's
# tolerance, the pair is a CROSS-EPOCH comparison — the r13 "249.7 vs
# 202.8 s on identical code" class — and the decade's totals carry that
# caveat as data, not prose. Tolerances are set from measured idle-box
# repeatability (min-of-N probe reps): CPU resolves to ±0.5%, so 10% is a
# decisive epoch signal; the virtualized disk only resolves to ~±11% even
# at min-of-3, so its threshold sits above that noise floor (the real
# write-back epochs the sf10 boards hit were 60%+). The two r15 legs
# target the state the r14 postmortem showed the idle legs miss:
# par_cpu_sec (32-way parallel sort, min-of-3, idle spread ±6% -> tol 12%)
# and rfsync_sec (2048 random 4KiB write+fsync ops, min-of-3, idle spread
# ±5% -> tol 20%, headroom for device-internal variance). Pre-r15 sidecars
# simply lack the new keys and are compared on the legs they have.
# Informational (printed + embedded), never an exit failure: a slow box is
# a measurement condition, not an unadjudicated finding.
EPOCH_TOL = {"cpu_sec": 0.10, "disk_sec": 0.25,
             "par_cpu_sec": 0.12, "rfsync_sec": 0.20}

def epoch_cmp(small, large, tolerances=None):
    tols = tolerances or EPOCH_TOL
    es, el = small.get("epoch_probe"), large.get("epoch_probe")
    if not es or not el:
        return {"comparable": False,
                "reason": "epoch probe missing on at least one board (pre-r14 sidecar)"}
    # a probe whose components are all non-positive is the writeArtifacts
    # default (0.0, 0.0, ...), i.e. a caller that omitted the probe — that
    # must read as MISSING, not as a silently-passing epoch check (ADVICE r14)
    if all((es.get(k) or 0) <= 0 for k in EPOCH_TOL) or \
       all((el.get(k) or 0) <= 0 for k in EPOCH_TOL):
        return {"comparable": False,
                "reason": "probe recorded but all components non-positive "
                          "(writeArtifacts default — probe omitted)"}
    out = {"comparable": True, "small": es, "large": el,
           "cross_epoch": False, "components": {}}
    for k in EPOCH_TOL:
        tol = tols.get(k, EPOCH_TOL[k])
        a, b = es.get(k), el.get(k)
        if not a or not b or a <= 0:
            continue
        r = round(b / a, 3)
        # symmetric in ratio space (ADVICE r15): abs(r-1) flags a
        # 1.21x-slower leg but not its 0.80x (=1.25x-faster) mirror; the
        # epoch question is direction-independent, and the board-divergence
        # check already uses max(r, 1/r) — keep the two consistent
        flag = max(r, 1.0 / r) - 1.0 > tol
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

# Same-code board comparability (VERDICT r14 asks #1b/#5): comparing two
# sidecars of the SAME scale factor (cross-round, or driver-vs-builder in
# one round) is a different question from a decade — the data is identical,
# so any total ratio far from 1.0 is either a code change or a box-state
# epoch. The r14 lesson: the idle-box probe can AGREE (cpu 6.5% apart,
# inside tolerance) while the boards diverge 23%, concentrated in
# fsync-heavy faces. So the transfer check flags on the BOARD TOTAL
# (common-query warm sum) ratio itself, regardless of probe agreement:
# >1.15x in either direction => the pair is not same-epoch-comparable and
# per-query ratios must be read as (code delta) x (epoch delta).
BOARD_DIVERGENCE_TOL = 1.15
# per-query divergent-face report: ratio beyond this in either direction
# AND at least one leg above the floor (sub-second faces jitter). The flat
# cut is the FALLBACK for faces with no empirical band (VERDICT r15 ask
# #1: the flat 2x both over-flagged transit_gtfs_corrupt, a face whose
# measured same-code band is 2-3x, and under-flagged tight cpu faces).
FACE_RATIO_TOL = 2.0
FACE_TIME_FLOOR = 0.5
# band-based cut: a face with an empirical band flags only OUTSIDE
# swing*MARGIN (five boards under-sample the true window — headroom), and
# never below FLOOR (a face whose five readings happened to agree to 2%
# must not flag at 1.1x — that is idle jitter, not a finding)
BAND_MARGIN = 1.25
BAND_FLOOR = 1.3

def face_allowed(band):
    """Max symmetric ratio a banded face may move before flagging."""
    return max(BAND_FLOOR, band["swing"] * BAND_MARGIN)

def cross_round(path_a, path_b, out_path, bands_path=None, tol_path=None):
    a, b = json.load(open(path_a)), json.load(open(path_b))
    bands = json.load(open(bands_path))["faces"] if bands_path else {}
    tolerances = None
    if tol_path:
        tolerances = {k: v["tolerance"]
                      for k, v in json.load(open(tol_path))["legs"].items()}
    qs = {}
    for k in sorted(a["queries"]):
        vb = b["queries"].get(k)
        if vb is None:
            continue
        ta, tb = t_of(a["queries"][k]), t_of(vb)
        qs[k] = {"t_a": ta, "t_b": tb,
                 "ratio": round(tb / ta, 3) if ta > 0 else None}
    total_a = round(sum(v["t_a"] for v in qs.values()), 1)
    total_b = round(sum(v["t_b"] for v in qs.values()), 1)
    total_ratio = round(total_b / total_a, 3) if total_a > 0 else None
    epoch = epoch_cmp(a, b, tolerances)
    diverged = (total_ratio is not None and
                max(total_ratio, 1.0 / total_ratio) > BOARD_DIVERGENCE_TOL)
    def allowed_of(k):
        return (round(face_allowed(bands[k]), 3) if k in bands
                else FACE_RATIO_TOL)
    def face_flags(k, v):
        if max(v["t_a"], v["t_b"]) <= FACE_TIME_FLOOR:
            return False
        if not v["ratio"]:
            # t_a == 0 with a real t_b is the MOST divergent shape, not an
            # innocent one (ADVICE r15: the truthiness filter dropped it)
            return True
        return max(v["ratio"], 1.0 / v["ratio"]) > allowed_of(k)
    def face_sev(k):
        v = qs[k]
        return (max(v["t_a"], v["t_b"]) * 1e9 if not v["ratio"]
                else max(v["ratio"], 1.0 / v["ratio"]))
    faces = sorted([k for k, v in qs.items() if face_flags(k, v)],
                   key=lambda k: -face_sev(k))
    for k in faces:
        qs[k]["allowed"] = allowed_of(k)
        if k in bands:
            qs[k]["band_swing"] = bands[k]["swing"]
    fams = {}
    for k, v in qs.items():
        fam = k.split("_")[0]
        fa, fb = fams.setdefault(fam, [0.0, 0.0])
        fams[fam] = [fa + v["t_a"], fb + v["t_b"]]
    fam_ratios = {f: {"t_a": round(x, 2), "t_b": round(y, 2),
                      "ratio": round(y / x, 3) if x > 0 else None}
                  for f, (x, y) in sorted(fams.items())}
    # probe-normalized view: divide the board ratio by each probe
    # component's ratio — if normalization brings it near 1.0, the probe
    # leg explains the divergence; if none does (the r14 case, before the
    # parallel/rfsync legs existed), the probe under-resolves and the
    # divergence stands as unexplained-by-instrument
    normalized = {}
    if epoch.get("comparable") and total_ratio:
        for k, comp in epoch.get("components", {}).items():
            if comp["ratio"] > 0:
                normalized[k] = round(total_ratio / comp["ratio"], 3)
    out = {
        "legs": {"a": path_a, "b": path_b},
        "sf_a": a.get("sf"), "sf_b": b.get("sf"),
        "same_sf": a.get("sf") == b.get("sf"),
        "n_queries_common": len(qs),
        "total_a_common": total_a, "total_b_common": total_b,
        "total_ratio": total_ratio,
        "board_divergence_tolerance": BOARD_DIVERGENCE_TOL,
        "board_divergence": diverged,
        "epoch": epoch,
        "face_cut": ({"mode": "empirical_bands", "source": bands_path,
                      "n_banded": len(bands), "margin": BAND_MARGIN,
                      "floor": BAND_FLOOR,
                      "fallback_flat": FACE_RATIO_TOL} if bands_path
                     else {"mode": "flat", "ratio_tol": FACE_RATIO_TOL}),
        "epoch_tolerances_source": tol_path or "hand-pinned EPOCH_TOL",
        "total_ratio_probe_normalized": normalized,
        "divergent_faces": {k: qs[k] for k in faces},
        "family_ratios": fam_ratios,
        "queries": qs,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"cross-round: {path_a} vs {path_b}")
    print(f"  common {len(qs)} queries, total {total_a} -> {total_b} s "
          f"(ratio {total_ratio})")
    if not out["same_sf"]:
        print(f"  WARNING: different sf ({a.get('sf')} vs {b.get('sf')}) — "
              f"ratios mix scale with epoch/code")
    if epoch.get("cross_epoch"):
        comps = ", ".join(f"{k} {v['ratio']}x"
                          for k, v in epoch["components"].items() if v["flag"])
        print(f"  CROSS-EPOCH by probe: {comps}")
    if diverged:
        print(f"  BOARD DIVERGENCE: same-code total ratio {total_ratio} "
              f"exceeds {BOARD_DIVERGENCE_TOL}x — not same-epoch-comparable "
              f"regardless of probe agreement"
              + ("" if epoch.get("cross_epoch") or not epoch.get("comparable")
                 else " (probe components all inside tolerance — the r14 "
                      "under-resolution class)"))
    if faces:
        def show(k):
            v = qs[k]
            r = f"{v['ratio']}x" if v["ratio"] else \
                f"t_a={v['t_a']}s t_b={v['t_b']}s (no ratio)"
            return f"{k} {r} (allowed {v['allowed']}x)"
        worst = ", ".join(show(k) for k in faces[:8])
        cut = "per-face bands" if bands_path else f"flat {FACE_RATIO_TOL}x"
        print(f"  divergent faces ({cut}, > {FACE_TIME_FLOOR}s): {worst}"
              + (" ..." if len(faces) > 8 else ""))
    print(f"wrote {out_path}")
    return 0

def face_bands(paths, out_path):
    """Per-face empirical variance bands (VERDICT r15 ask #1): the observed
    max/min warm-time swing of every face across N same-code same-SF
    sidecars. fsync-family faces measure 2-3x on this box while cpu-bound
    faces sit under 1.2x — one flat cut cannot serve both, so the
    cross-round transfer check consumes these bands instead."""
    boards = [(p, json.load(open(p))) for p in paths]
    sfs = {b.get("sf") for _, b in boards}
    names = set(boards[0][1]["queries"])
    for _, b in boards[1:]:
        names &= set(b["queries"])
    faces = {}
    for k in sorted(names):
        ts = [t_of(b["queries"][k]) for _, b in boards]
        lo, hi = min(ts), max(ts)
        faces[k] = {"n": len(ts), "t_min": round(lo, 3), "t_max": round(hi, 3),
                    # floor the denominator: a 0.000 reading would make the
                    # swing infinite; 1 ms is below every real face's cost
                    "swing": round(hi / max(lo, 0.001), 3)}
    out = {"method": "per-face max/min warm ratio across same-code same-SF "
                     "boards; cross-round flags only outside "
                     f"swing*{BAND_MARGIN} (floor {BAND_FLOOR}x)",
           "boards": list(paths), "sfs": sorted(s for s in sfs if s),
           "n_faces": len(faces), "faces": faces}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    widest = sorted(faces, key=lambda k: -faces[k]["swing"])[:8]
    print(f"face-bands: {len(paths)} boards, {len(faces)} common faces")
    if len(sfs) > 1:
        print(f"  WARNING: boards span multiple sf tags {sorted(map(str, sfs))}"
              f" — bands only mean something within one SF")
    print("  widest: " + ", ".join(f"{k} {faces[k]['swing']}x" for k in widest))
    print(f"wrote {out_path}")
    return 0

# ledger-derived probe tolerances (VERDICT r15 ask #4). The hand-pinned
# EPOCH_TOL constants were inferred from a handful of readings; the ledger
# now holds dozens. Derivation per leg: keep only IDLE-CLASS contexts
# (boards probe in the untimed pre-Spark window of an otherwise idle box;
# standalone/repeatability/pre-chain readings are idle by construction —
# but probes BRACKETING load experiments, e.g. the r16 gtfs-ab pre/post
# pair, deliberately measure a loaded window and must not widen the idle
# band), then robust-filter the rows (drop any outside
# [median/OUTLIER_CUT, median*OUTLIER_CUT] — the ledger carries four
# pre-pin r15 rows taken at SMALLER leg sizes before the size-pin landed,
# ~2x/20x off), then tolerance = max deviation from the median in
# symmetric-ratio terms, with LEDGER_HEADROOM for the under-sampled tail,
# floored at TOL_FLOOR.
LEDGER_OUTLIER_CUT = 1.7
LEDGER_HEADROOM = 1.25
LEDGER_TOL_FLOOR = 0.05
LEDGER_IDLE_CONTEXTS = "bench:|pre-chain|standalone|repeatability"

def ledger_bands(ledger_path, out_path, contexts=LEDGER_IDLE_CONTEXTS):
    import re
    all_rows = [json.loads(l) for l in open(ledger_path) if l.strip()]
    rows = [r for r in all_rows if re.search(contexts, r.get("context", ""))]
    dropped = sorted({r.get("context", "") for r in all_rows
                      if r not in rows})
    legs = {}
    for k in EPOCH_TOL:
        vs = sorted(r[k] for r in rows if r.get(k, 0) > 0)
        if not vs:
            continue
        med = vs[len(vs) // 2]
        used = [v for v in vs
                if med / LEDGER_OUTLIER_CUT <= v <= med * LEDGER_OUTLIER_CUT]
        excluded = [v for v in vs if v not in used]
        dev = max(max(used) / med, med / min(used)) - 1.0
        tol = round(max(LEDGER_TOL_FLOOR, dev * LEDGER_HEADROOM), 3)
        legs[k] = {"n_used": len(used), "n_excluded": len(excluded),
                   "excluded": [round(v, 3) for v in excluded],
                   "min": round(min(used), 3), "median": round(med, 3),
                   "max": round(max(used), 3),
                   "max_deviation": round(dev, 3),
                   "tolerance": tol, "hand_pinned": EPOCH_TOL[k]}
    out = {"method": "per-leg idle band from the standing epoch ledger: "
                     f"idle-context filter /{contexts}/ (probes bracketing "
                     "load experiments are deliberately non-idle), then "
                     f"median-filter at {LEDGER_OUTLIER_CUT}x (drops pre-pin "
                     "rows measured at different leg sizes), tolerance = max "
                     f"symmetric deviation * {LEDGER_HEADROOM} headroom, "
                     f"floor {LEDGER_TOL_FLOOR}",
           "ledger": ledger_path, "contexts": contexts,
           "n_rows_total": len(all_rows), "n_rows_idle": len(rows),
           "contexts_dropped": dropped, "legs": legs}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if dropped:
        print(f"ledger-bands: dropped non-idle contexts: {dropped}")
    for k, v in legs.items():
        print(f"ledger-bands {k}: n={v['n_used']} (excl {v['n_excluded']}) "
              f"median={v['median']} band=[{v['min']}, {v['max']}] "
              f"tol={v['tolerance']} (hand-pinned {v['hand_pinned']})")
    print(f"wrote {out_path}")
    return 0

def pop_opt(rest, name, default=None):
    if name in rest:
        i = rest.index(name)
        val = rest[i + 1]
        del rest[i:i + 2]
        return val
    return default

def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--cross-round":
        rest = sys.argv[2:]
        out_path = pop_opt(rest, "--out", "reports/cross_round.json")
        bands_path = pop_opt(rest, "--bands")
        tol_path = pop_opt(rest, "--tolerances")
        if len(rest) != 2:
            sys.exit("usage: standing_scaling.py --cross-round <sidecarA>"
                     " <sidecarB> [--out path] [--bands path]"
                     " [--tolerances path]")
        sys.exit(cross_round(rest[0], rest[1], out_path, bands_path, tol_path))
    if len(sys.argv) >= 2 and sys.argv[1] == "--face-bands":
        rest = sys.argv[2:]
        out_path = pop_opt(rest, "--out", "reports/face_bands.json")
        if len(rest) < 2:
            sys.exit("usage: standing_scaling.py --face-bands <sidecar1>"
                     " <sidecar2> [...] --out path")
        sys.exit(face_bands(rest, out_path))
    if len(sys.argv) >= 2 and sys.argv[1] == "--ledger-bands":
        rest = sys.argv[2:]
        out_path = pop_opt(rest, "--out", "reports/epoch_tolerances.json")
        contexts = pop_opt(rest, "--contexts", LEDGER_IDLE_CONTEXTS)
        if len(rest) != 1:
            sys.exit("usage: standing_scaling.py --ledger-bands <ledger.jsonl>"
                     " [--out path] [--contexts regex]")
        sys.exit(ledger_bands(rest[0], out_path, contexts))
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
