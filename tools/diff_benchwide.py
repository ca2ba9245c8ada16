#!/usr/bin/env python3
"""Diff two BENCHWIDE.json snapshots and flag real regressions.

BENCHWIDE is one COLD pass per query, so run-to-run noise is larger than
the warm-median protocol in BENCH.json. A per-query delta is flagged only
when it exceeds a noise bar derived from the run pair itself:

  bar = max(2 * headline_cv, MIN_REL) relative change, AND abs delta >= MIN_ABS

where headline_cv is the median per-query CV from the current BENCH.json
(the measured run-to-run noise of this box, from the 5-warm-run
protocol); MIN_REL (default 0.5, i.e. 50%) keeps cold-pass jitter out;
MIN_ABS (default 0.3 s) keeps sub-second queries from dominating the
report with meaningless ratios.

Self-qualification (round 13, VERDICT r12 #3): the report downgrades its
own flag list when its evidence says the list can't be trusted —

  - PROBE queries are excluded from per-query flagging: the before-probe
    warms exactly those ten queries, so their sweep entries are
    warm-biased (ADVICE r12; their drift duty is served by the probe
    block itself). When only one snapshot carries probes, the bias is
    asymmetric — the report marks the transition.
  - When either snapshot's INTRA-sweep probe spread (probe_after /
    probe_before) deviates from 1.0 beyond --max-probe-spread (default
    0.15, i.e. outside [1/1.15, 1.15]), the box moved mid-sweep and a
    single drift ratio cannot de-drift individual cold times: the flag
    list is SUPPRESSED to a count + reason (r12's 0.706 spread would
    have collapsed 37 flags to one line), and adjudication falls back to
    the interleaved A/B protocol in SCALE.md.
  - SHARDED snapshots (round 14) qualify by REPEATABILITY instead: the
    fresh-JVM warm-up is front-loaded in every shard (measured r14:
    per-shard spreads 0.57-0.80 even at ~75 queries/shard — the JIT
    horizon is minutes, so no shard size reaches spread ~1), but query
    order and shard membership are pinned, so the warm-up profile is a
    position-dependent multiplier that REPEATS run-over-run and cancels
    in per-query ratios. Flags are reliable iff both snapshots use the
    same shard protocol AND each shard's intra-sweep spread matches its
    counterpart within --max-spread-mismatch (default 0.10 in log
    space): a matching signature means like positions saw like warm-up;
    a mismatched one means a shard's environment changed mid-run.

Usage:
  python3 tools/diff_benchwide.py OLD.json NEW.json [--bench BENCH.json]
                                  [--min-rel 0.5] [--min-abs 0.3]
                                  [--max-probe-spread 0.15]

Typical: python3 tools/diff_benchwide.py <(git show HEAD:BENCHWIDE.json) \
         BENCHWIDE.json --bench BENCH.json
Exit code 0 always (a report, not a gate); the flagged list is for human
adjudication per the protocol in SCALE.md.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--bench", default=None,
                    help="BENCH.json with a cv block, for the noise bar")
    ap.add_argument("--min-rel", type=float, default=0.5)
    ap.add_argument("--min-abs", type=float, default=0.3)
    ap.add_argument("--max-probe-spread", type=float, default=0.15,
                    help="suppress per-query flags when either snapshot's "
                         "intra-sweep probe spread is outside "
                         "[1/(1+x), 1+x] (unsharded snapshots)")
    ap.add_argument("--max-spread-mismatch", type=float, default=0.10,
                    help="sharded pairs: suppress per-query flags when any "
                         "shard's intra-sweep spread differs from its "
                         "counterpart by more than this in log space")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]

    cv_bar = 0.0
    if args.bench:
        bench = load(args.bench)
        cvs = list(bench.get("cv", {}).values())
        if cvs:
            cv_bar = 2 * statistics.median(cvs)
    rel_bar = max(cv_bar, args.min_rel)

    # Uniform drift check first: if the box itself sped up or slowed down
    # between the two runs, per-query flags would just re-report the
    # drift N times. Preferred estimator (round 12): the FIXED calibration
    # probe both snapshots carry (probe_before/probe_after, 10 pinned
    # queries, 3-warm-median, run before AND after each sweep) — a drift
    # estimate independent of the 297 swept queries it then de-drifts.
    # Per side the probe reading is min(before, after): min is the right
    # estimator for a lower-bounded timing corrupted by one-sided noise.
    # Fallback for pre-r12 snapshots without a probe block: the median
    # ratio over the shared sweep queries (the old, circular estimate —
    # still reported as sweep_drift_ratio for cross-checking).
    shared = sorted(set(oq) & set(nq))
    ratios = [nq[q] / oq[q] for q in shared if oq[q] > 0]
    sweep_drift = statistics.median(ratios) if ratios else 1.0

    def probe_min(snap):
        b, a = snap.get("probe_before", {}), snap.get("probe_after", {})
        return {q: min(b[q], a[q]) for q in set(b) & set(a)}

    def probe_spread(snap):
        # Sharded snapshot (round 14): each query's cold time comes from
        # exactly one fresh-JVM shard, so the qualification question is
        # "did ANY shard's box move mid-shard" — use the worst-deviation
        # per-shard spread, not a global before/after (whose pair would
        # straddle shard boundaries and JVM restarts).
        ss = snap.get("shard_spreads")
        if ss:
            import math as _m
            return max(ss.values(), key=lambda s: abs(_m.log(s)))
        b, a = snap.get("probe_before", {}), snap.get("probe_after", {})
        rs = [a[q] / b[q] for q in set(b) & set(a) if b[q] > 0]
        return round(statistics.median(rs), 3) if rs else None

    po, pn = probe_min(old), probe_min(new)
    probe_shared = sorted(set(po) & set(pn))
    probe_drift = (statistics.median([pn[q] / po[q] for q in probe_shared])
                   if probe_shared else None)
    drift = probe_drift if probe_drift is not None else sweep_drift

    # Probe queries are warm-biased in the sweep of any probe-carrying
    # snapshot (the before-probe just ran them 4x) — never flag them;
    # the probe block itself is their round-over-round comparison.
    probe_names = set(old.get("probe_before", {})) | set(new.get("probe_before", {}))
    flagged = []
    for q in shared:
        if q in probe_names:
            continue
        o, n = oq[q], nq[q]
        if o <= 0:
            continue
        adj = n / drift  # de-drift before comparing
        rel = (adj - o) / o
        if abs(rel) >= rel_bar and abs(adj - o) >= args.min_abs:
            flagged.append({"query": q, "old_sec": round(o, 3),
                            "new_sec": round(n, 3),
                            "new_dedrifted_sec": round(adj, 3),
                            "rel_change": round(rel, 3)})
    flagged.sort(key=lambda r: -abs(r["rel_change"]))

    # Self-qualification: a box that moved mid-sweep makes single-ratio
    # de-drifting of individual cold times meaningless.
    import math
    spread_bar = math.log(1.0 + args.max_probe_spread)
    shard_transition = old.get("n_shards", 1) != new.get("n_shards", 1)
    so, sn = old.get("shard_spreads"), new.get("shard_spreads")
    flags_note = None
    spread_mismatch = None
    if shard_transition:
        flags_reliable = False
        flags_note = ("shard protocol changed between snapshots: each "
                      "query's cold time now sits in a different warm-up "
                      "context — totals comparable, per-query flags are "
                      "not (one-round discontinuity; round 14)")
    elif so and sn:
        # Sharded pair: qualify by warm-up-signature REPEATABILITY (see
        # module docstring) — per-shard spreads must match across the
        # two snapshots, not sit near 1.0 (they never do: the fresh-JVM
        # warm-up is front-loaded in every shard).
        spread_mismatch = {
            i: round(abs(math.log(sn[i] / so[i])), 3)
            for i in sorted(set(so) & set(sn))}
        missing = set(so) ^ set(sn)
        bad = {i: m for i, m in spread_mismatch.items()
               if m > args.max_spread_mismatch}
        flags_reliable = not bad and not missing
        if bad or missing:
            flags_note = (f"warm-up signature did not repeat: shard spread "
                          f"mismatch {bad or sorted(missing)} exceeds "
                          f"{args.max_spread_mismatch} — per-query ratios "
                          "no longer cancel the warm-up profile; use the "
                          "interleaved A/B protocol (SCALE.md)")
    else:
        spreads = [s for s in (probe_spread(old), probe_spread(new)) if s]
        unstable = [s for s in spreads if abs(math.log(s)) > spread_bar]
        flags_reliable = not unstable
        if unstable:
            flags_note = (f"intra-sweep probe spread {unstable} outside "
                          f"[{round(1/(1+args.max_probe_spread), 3)}, "
                          f"{1+args.max_probe_spread}]: the box moved "
                          "mid-sweep, per-query flags are unadjudicable "
                          "from this sweep — use the interleaved A/B "
                          "protocol (SCALE.md)")

    report = {
        "old_total_sec": old.get("value"),
        "new_total_sec": new.get("value"),
        "n_shared": len(shared),
        "only_in_old": sorted(set(oq) - set(nq)),
        "only_in_new": sorted(set(nq) - set(oq)),
        "median_drift_ratio": round(drift, 3),
        "drift_source": "probe" if probe_drift is not None else "sweep",
        "probe_drift_ratio": (round(probe_drift, 3)
                              if probe_drift is not None else None),
        "sweep_drift_ratio": round(sweep_drift, 3),
        "intra_sweep_drift_old": probe_spread(old),
        "intra_sweep_drift_new": probe_spread(new),
        "shard_spreads_old": old.get("shard_spreads"),
        "shard_spreads_new": new.get("shard_spreads"),
        "shard_spread_mismatch_log": spread_mismatch,
        "shard_transition": (old.get("n_shards", 1) != new.get("n_shards", 1)
                             and f"shard protocol changed "
                                 f"{old.get('n_shards', 1)} -> "
                                 f"{new.get('n_shards', 1)}: per-query "
                                 "warm-up context differs across snapshots; "
                                 "totals comparable, per-query flags are not"
                             or None),
        "rel_bar": round(rel_bar, 3),
        "min_abs_sec": args.min_abs,
        "probe_queries_excluded": sorted(probe_names & set(shared)),
        "probe_transition": (("probe_before" in old) != ("probe_before" in new)
                             and "one snapshot predates probe blocks: totals "
                                 "straddle the probe-warm discontinuity"
                             or None),
        "flags_reliable": flags_reliable,
        "flags_note": flags_note,
        "suppressed_flag_count": 0 if flags_reliable else len(flagged),
        "flagged": flagged if flags_reliable else [],
    }
    json.dump(report, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
