#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and diff exactly (columns sorted by name, rows
sorted, values compared bit-for-bit).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only queries (no oracle): emulate the driver's weaker check
    for q in sorted(os.listdir(out_dir)):
        if q == "oracle_sql.json" or q in oracles:
            continue
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        if n > 0:
            print(f"PASS {q} (rows-only: {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {q}: rows-only check found no rows")
            n_fail += 1
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in spark_files])
        want = con.execute(sql).df()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        dt_mismatch = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                       if str(g[c].dtype) != str(w[c].dtype)]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch {dt_mismatch}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c].reset_index(drop=True), w[c].reset_index(drop=True)
            try:
                same = a.equals(b) or (a.astype("object") == b.astype("object")).all()
            except Exception:
                same = False
            if not same:
                bad = (a.astype("object") != b.astype("object"))
                i = bad[bad].index[0] if bad.any() else 0
                mismatch = (c, a.dtype, b.dtype, a.iloc[i], b.iloc[i])
                break
        if mismatch:
            c, dta, dtb, va, vb = mismatch
            print(f"FAIL {name}: col {c} spark({dta})={va!r} duck({dtb})={vb!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
