#!/usr/bin/env python3
"""Dev-only self-check: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Spark result) + <outDir>/oracle_sql.json,
runs the SQL in DuckDB against the sfDir tables, sorts columns by name, and
compares shapes and values (exact; floats bitwise + tolerance fallback report).
NOT part of the Scala library — used only to validate oracle parity locally.
"""
import json, sys, glob, os, warnings
warnings.filterwarnings("ignore", category=FutureWarning)
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver-shipped tables are single files; GenData writes Spark-style
    # directories — register either shape
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for qname, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{qname}"
    if not os.path.isdir(pdir):
        print(f"FAIL {qname}: no spark output"); fail += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{pdir}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {qname}: read spark output: {e}"); fail += 1; continue
    try:
        rel = con.sql(sql)
        # Guard: DuckDB types bare SUM(int) as HUGEINT (int128), which the
        # driver's hash serializes differently from Spark's BIGINT even when
        # values are identical — the round-1 failure class. Authored oracles
        # must CAST such outputs to BIGINT.
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()]
        if huge:
            print(f"FAIL {qname}: oracle emits HUGEINT column(s) {huge} — wrap in CAST(... AS BIGINT)")
            fail += 1; continue
        duck_df = rel.df()
    except Exception as e:
        print(f"FAIL {qname}: duckdb error: {e}"); fail += 1; continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1).reset_index(drop=True)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1).reset_index(drop=True)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {qname}: columns {list(a.columns)} vs {list(b.columns)}"); fail += 1; continue
    if a.shape != b.shape:
        print(f"FAIL {qname}: shape {a.shape} vs {b.shape}"); fail += 1; continue
    for c in a.columns:
        if a[c].dtype.kind != b[c].dtype.kind:
            print(f"WARN {qname}: col {c} dtype spark={a[c].dtype} vs duckdb={b[c].dtype}")
    ok = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            af, bf = av.astype(float), bv.astype(float)
            nan_eq = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | nan_eq
            if not exact.all():
                close = np.isclose(af, bf, rtol=1e-9, atol=1e-12) | nan_eq
                i = int(np.argmin(exact))
                tag = "CLOSE-BUT-NOT-BITWISE" if close.all() else "VALUE-MISMATCH"
                print(f"FAIL {qname}: col {c} {tag} row {i}: {af[i]!r} vs {bf[i]!r}")
                ok = False
        else:
            if not (pd.Series(av).astype(object).fillna('\0') == pd.Series(bv).astype(object).fillna('\0')).all():
                mism = pd.Series(av).astype(object).fillna('\0') != pd.Series(bv).astype(object).fillna('\0')
                i = int(np.argmax(mism.to_numpy()))
                print(f"FAIL {qname}: col {c} row {i}: {av[i]!r} vs {bv[i]!r}")
                ok = False
        if not ok: break
    if ok:
        print(f"OK   {qname}: {a.shape[0]} rows x {a.shape[1]} cols")
    else:
        fail += 1
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
