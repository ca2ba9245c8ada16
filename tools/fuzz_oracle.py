#!/usr/bin/env python3
"""Oracle fuzz for the capped LSH/vector families (round-11, VERDICT r10 #3).

Cap-fire engine≡DuckDB parity was proven on two HAND-PLANTED corpora
(boiler at cap 100/25, clustered at cap 100). This harness closes the gap
between "parity on the corpora we thought of" and "parity": it generates N
randomized small corpora — sweeping vocabulary size, boilerplate rate,
marker rate, planted dup rate, cluster count/tightness, and the cap itself
(including caps low enough to fire on ORGANIC buckets, not just planted
mega-buckets) — and asserts the full rows+schema+values oracle compare on
the capped query families for every one.

Each trial is one fresh JVM per (corpus, cap): Dedup.DefaultMaxBucket and
the oracle CTEs that interpolate it are both resolved at class init, so
engine and oracle always see the SAME cap by construction — the trial
varies the pair together, never separately.

Parameters are drawn from random.Random(SEED + trial) — reruns reproduce
the identical corpus set; bump SEED (env FUZZ_SEED) to explore new ground.

Usage: python3 tools/fuzz_oracle.py [nText] [nVec]     (default 14 + 6)
Needs compiled classes (sbt compile). Writes under /tmp/graft-fuzz/.
Exit 0 = every trial matched; any mismatch prints the failing trial's
full recipe (so it can be replayed by hand) and exits 1.

CI mode (round 12, VERDICT r11 #3): `python3 tools/fuzz_oracle.py --ci`
runs the PINNED subset below — the defect class this harness catches
(degenerate-corpus contract drift) reopens silently as queries evolve,
so a small always-on gate complements the big randomized sweep:
  - the r11 t04 empty-truth corpus (vocab 200, no boiler/dups, cap 3) —
    the recipe that caught the NULL-n_common and ANSI-0/0 defects;
  - the r11 t00 organic-shed corpus (vocab 5k, 10% boiler, cap 3) —
    cap firing on organic buckets, not planted mega-buckets;
  - two vector corpora on ADJACENT key-ladder rungs (n=500 → w=4 and
    n=1000 → w=5), so the closed-form band interpolation (bc CTE) is
    exercised beyond its lowest arm every round;
  - (round 13, VERDICT r12 #1) the MEASURED recall-floor rung: the exact
    ladder rung-1 corpus (clustered-embs 50 0.35 at sf0.1 → n=2000, w=6),
    cap idle, with a recall_hi >= RecallFloor assertion read from q298's
    own output — r12's rung 1 passed by 0.0017 and sat BELOW the closed
    form, so the formula-only spec pin could not catch a real-world dip;
    this gate pins the measurement itself (now with the narrow-width
    margin band: closed form 0.9507 at w=6, b=6);
  - (round 13, VERDICT r12 #5) two FORCED-WIDTH corpora (w=12 and w=15
    via SPARK_GRAFT_LSH_KEY_BITS, shared by engine and oracle at class
    init) so the upper arms of the oracle's b(w) CASE table — unreachable
    from corpus size at fuzz scale — are parity-checked every round.
Trials run concurrently (one fresh JVM each, 8 cores per trial); wall
time ~5-8 min. Wired into tools/round_open.sh so every round opens gated.
"""
import concurrent.futures
import json, os, random, shutil, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = "/tmp/graft-fuzz"
SEED = int(os.environ.get("FUZZ_SEED", "1101"))
_POS = [a for a in sys.argv[1:] if not a.startswith("-")]
N_TEXT = int(_POS[0]) if len(_POS) > 0 else 14
N_VEC = int(_POS[1]) if len(_POS) > 1 else 6

# documents-only capped family (the q22/q39/q63/q112/q119 shapes VERDICT
# names, plus the other pipelines that ride the shared capped CTEs)
TEXT_QUERIES = ",".join([
    "q22_minhash_lsh", "q39_dedup_clusters", "q63_dedup_apply",
    "q53_lsh_recall", "q119_curation_funnel", "q23_simhash",
    "q54_winnow_neardup", "q118_prefix_join", "q136_containment",
    "q291_lsh_scurve"])
# embeddings-only capped family
VEC_QUERIES = ",".join([
    "q47_embed_lsh", "q35_embed_neardup_ivf", "q112_semdedup",
    "q218_margin_mining_ivf", "q298_embed_lsh_recall"])


def run(cmd, env=None, tag=""):
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, env=e, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        print(f"--- {tag} failed (rc={r.returncode}) ---")
        print(" ".join(cmd))
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
    return r


def java(xmx, main, args, env=None, tag=""):
    return run([f"{REPO}/tools/graft_java.sh", xmx, main] + [str(a) for a in args],
               env=env, tag=tag)


def trial_text(i):
    rng = random.Random(SEED + i)
    vocab = rng.choice([200, 1000, 5000, 20000, 100000])
    boiler = rng.choice([0.0, 0.02, 0.05, 0.1, 0.2])
    marker = rng.choice([0.0, 0.15])
    dup = rng.choice([0.0, 0.02, 0.05, 0.15])
    cap = rng.choice([3, 10, 50])
    return dict(kind="text", vocab=vocab, boiler=boiler, marker=marker,
                dup=dup, cap=cap, sf=0.001)


def trial_vec(i):
    rng = random.Random(SEED + 10000 + i)
    k = rng.choice([3, 10, 50])
    sigma = rng.choice([0.15, 0.35, 0.6])
    cap = rng.choice([10, 50, 100])
    # 200 / 500 / 1000 / 1100 vectors — the last two cross the adaptive
    # key ladder onto w=5 and w=6 (and with it the closed-form band-count
    # CASE arms nb=4, nb=5), so the randomized sweep fuzzes the band
    # interpolation the same way it fuzzes the cap (VERDICT r11 #6a)
    sf = rng.choice([0.01, 0.025, 0.05, 0.055])
    t = dict(kind="vec", k=k, sigma=sigma, cap=cap, sf=sf)
    # 3-in-8 draws force an off-ladder key width (r13): the upper b(w)
    # CASE arms are unreachable from corpus size at fuzz scale
    kb = rng.choice([None, None, None, None, None, 11, 13, 14])
    if kb:
        t["key_bits"] = kb
    return t


# Pinned CI recipes (see module docstring). Keep t04/t00 byte-identical
# to the r11 randomized draws they replay.
CAP_IDLE = 1000000000
CI_TRIALS = [
    dict(kind="text", vocab=200, boiler=0.0, marker=0.15, dup=0.0,
         cap=3, sf=0.001),                                   # r11 t04
    dict(kind="text", vocab=5000, boiler=0.1, marker=0.15, dup=0.02,
         cap=3, sf=0.001),                                   # r11 t00
    dict(kind="vec", k=3, sigma=0.35, cap=100, sf=0.025),    # n=500, w=4
    dict(kind="vec", k=10, sigma=0.35, cap=100, sf=0.05),    # n=1000, w=5
    # ladder rung 1, MEASURED floor gate (r13): the exact clustered
    # mixture of tools/gen_corpora.sh at sf0.1 (n=2000, w=6, b=6),
    # cap idle so the floor contract applies; asserts q298's own
    # recall_hi >= floor and n_shed_buckets = 0 beyond oracle parity.
    dict(kind="vec", k=50, sigma=0.35, cap=CAP_IDLE, sf=0.1,
         queries="q47_embed_lsh,q298_embed_lsh_recall",
         floor_recall_hi=0.9),
    # forced-width arms (r13): w=12 (nb=14) and w=15 (nb=23) pin the
    # upper b(w) CASE arms the adaptive ladder can't reach at fuzz scale.
    dict(kind="vec", k=10, sigma=0.35, cap=CAP_IDLE, sf=0.025,
         queries="q47_embed_lsh,q298_embed_lsh_recall", key_bits=12),
    dict(kind="vec", k=10, sigma=0.35, cap=CAP_IDLE, sf=0.025,
         queries="q47_embed_lsh,q298_embed_lsh_recall", key_bits=15),
]


def run_trial(i, t):
    d = f"{ROOT}/t{i:02d}"
    corpus, out = f"{d}/corpus", f"{d}/out"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    if t["kind"] == "text":
        g = java("8g", "graft.GenData",
                 [corpus, t["sf"], "zipf-docs", t["vocab"], t["boiler"],
                  t["marker"], t["dup"]],
                 env={"SPARK_GRAFT_CPUS": "8"}, tag=f"t{i} gen")
        queries = t.get("queries", TEXT_QUERIES)
    else:
        g = java("8g", "graft.GenData",
                 [corpus, t["sf"], "clustered-embs", t["k"], t["sigma"]],
                 env={"SPARK_GRAFT_CPUS": "8"}, tag=f"t{i} gen")
        queries = t.get("queries", VEC_QUERIES)
    if g.returncode != 0:
        return False, "gendata failed"
    env = {"SPARK_GRAFT_CPUS": "8",
           "SPARK_GRAFT_LSH_MAX_BUCKET": str(t["cap"])}
    if "key_bits" in t:
        # forced band-key width: the Verify JVM interpolates it into BOTH
        # the engine ladder and the oracle's wc CTE at class init, so
        # check_oracle needs no knowledge of it
        env["SPARK_GRAFT_LSH_KEY_BITS"] = str(t["key_bits"])
    v = java("8g", "graft.Verify", [corpus, out, queries],
             env=env, tag=f"t{i} verify")
    if v.returncode != 0:
        return False, "verify failed"
    per_query_errs = [l for l in v.stderr.splitlines() if "[verify]" in l]
    if per_query_errs:
        return False, "; ".join(per_query_errs)
    c = run(["python3", "-W", "ignore", f"{REPO}/tools/check_oracle.py",
             corpus, out], tag=f"t{i} oracle")
    tail = c.stdout.strip().splitlines()[-1] if c.stdout.strip() else "no output"
    if c.returncode != 0:
        return False, tail
    if "floor_recall_hi" in t:
        # MEASURED recall-floor gate (r13): beyond engine≡oracle parity,
        # the rung's recall_hi must hold the declared floor, and the shed
        # audit must confirm the floor contract applied (cap idle).
        import duckdb
        # Verify writes each result as <out>/<query-name>/ (a Spark
        # parquet directory, no suffix — the layout check_oracle reads)
        row = duckdb.sql(
            f"SELECT recall_hi, n_shed_buckets FROM "
            f"read_parquet('{out}/q298_embed_lsh_recall/*.parquet')"
        ).fetchone()
        recall_hi, shed = float(row[0]), int(row[1])
        if shed != 0:
            return False, f"floor gate: cap shed {shed} buckets on an idle-cap rung"
        if recall_hi < t["floor_recall_hi"]:
            return False, (f"MEASURED rung recall_hi={recall_hi:.4f} below "
                           f"floor {t['floor_recall_hi']}")
        tail += f"; measured recall_hi={recall_hi:.4f} >= {t['floor_recall_hi']}"
    return True, tail


def main():
    global ROOT
    ci = "--ci" in sys.argv
    if ci:
        ROOT = "/tmp/graft-fuzz-ci"
        trials = CI_TRIALS
    else:
        trials = [trial_text(i) for i in range(N_TEXT)] + \
                 [trial_vec(i) for i in range(N_VEC)]
    os.makedirs(ROOT, exist_ok=True)

    def one(it):
        i, t = it
        t0 = time.time()
        try:
            ok, detail = run_trial(i, t)
        except Exception as e:
            # a harness bug must surface as a FAILED trial, not crash the
            # pool (where a shell pipe can mask the nonzero exit)
            ok, detail = False, f"harness exception: {e!r}"
        return i, t, ok, detail, time.time() - t0

    results, failed = [], 0
    # CI mode runs the pinned set concurrently (each trial is its own
    # 8-core JVM + DuckDB process); the randomized sweep stays sequential
    # so a long sweep never saturates a shared box.
    workers = min(len(trials), 4) if ci else 1
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        for i, t, ok, detail, dt in ex.map(one, enumerate(trials)):
            rec = dict(trial=i, ok=ok, secs=round(dt, 1), detail=detail, **t)
            results.append(rec)
            print(("PASS" if ok else "FAIL") +
                  f" t{i:02d} [{dt:5.1f}s] {json.dumps(t)} -> {detail}",
                  flush=True)
            if ok:  # keep failing trials on disk for replay
                shutil.rmtree(f"{ROOT}/t{i:02d}", ignore_errors=True)
            else:
                failed += 1
    summary = dict(seed=SEED, mode="ci" if ci else "sweep",
                   n_trials=len(trials), n_failed=failed, trials=results)
    with open(f"{ROOT}/fuzz_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{len(trials) - failed}/{len(trials)} fuzz trials match "
          f"({'pinned CI set' if ci else f'seed {SEED}'}); "
          f"summary at {ROOT}/fuzz_summary.json")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
