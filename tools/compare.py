#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (Spark parquet dir) and the oracle SQL
from <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB with views
named after the testdata tables, and compares: row count, column names,
and a hash of the value matrix (columns sorted by name, rows sorted).
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        try:
            got = con.execute(
                f"select * from read_parquet('{pdir}/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(gcols) == sorted(ecols)
        ok_hash = ok_cols and frame_hash(gcols, got) == frame_hash(ecols, exp)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, cols {sorted(gcols)} vs {sorted(ecols)}, hash={'ok' if ok_hash else 'MISMATCH'}")
            if ok_cols and not ok_hash:
                order = sorted(range(len(gcols)), key=lambda i: gcols[i])
                gs = sorted(tuple(norm_cell(r[i]) for i in order) for r in got)
                eo = sorted(range(len(ecols)), key=lambda i: ecols[i])
                es = sorted(tuple(norm_cell(r[i]) for i in eo) for r in exp)
                for i, (a, b) in enumerate(zip(gs, es)):
                    if a != b:
                        print(f"  first diff row {i}: got={a} exp={b}")
                        break
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
