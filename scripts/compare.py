#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Reads a Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf parquet tables, and compares
row count, sorted column names, and a row-order-insensitive value hash
(values rounded for float stability), mirroring the driver's compare.

Usage: python3 scripts/compare.py /root/testdata/sf0.01 /tmp/verify_r6
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    import decimal
    if v is None:
        return "\\N"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        return format(round(v, 6), ".6f")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_norun = 0
    for name in names:
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"NORUN {name} (no spark output)")
            n_norun += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            grows = got.fetchall()
            gcols = [d[0] for d in got.description]
            want = con.execute(oracle[name])
            wrows = want.fetchall()
            wcols = [d[0] for d in want.description]
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
            continue
        ok_rows = len(grows) == len(wrows)
        ok_cols = sorted(gcols) == sorted(wcols)
        ok_hash = ok_cols and table_hash(gcols, grows) == table_hash(
            wcols, wrows)
        if ok_rows and ok_cols and ok_hash:
            n_pass += 1
        else:
            n_fail += 1
            why = []
            if not ok_rows:
                why.append(f"rows {len(grows)}!={len(wrows)}")
            if not ok_cols:
                why.append(f"cols {sorted(gcols)}!={sorted(wcols)}")
            elif not ok_hash:
                why.append("hash")
            print(f"FAIL {name}: {'; '.join(why)}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_norun} norun "
          f"of {len(names)}")


if __name__ == "__main__":
    main()
