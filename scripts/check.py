#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Reads <outDir>/<query>/ parquet (Spark output) and <outDir>/oracle_sql.json,
runs each oracle against the sfDir parquet tables registered under bare
names, and hash-compares (columns sorted by name, rows sorted, values
stringified) — strict superset of whatever the driver checks.
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def table_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join("NULL" if v is None or (isinstance(v, float) and v != v)
                           else repr(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        hg, hw = table_hash(g), table_hash(w)
        if hg != hw:
            print(f"FAIL {name}: hash mismatch ({len(g)} rows)")
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            print(g[bad].head(3))
            print(w[bad].head(3))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
