#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <outDir>/<query>/ parquet (Spark output) and <outDir>/oracle_sql.json,
runs each oracle against the sfDir parquet tables registered under bare
names, and compares EXACT TYPED VALUES (no pandas float64 round-trip —
round-1 postmortem: .df() coerced DECIMAL to float64 and masked the
representation mismatches the driver flags). Canonicalization:

  - columns sorted by name (mirrors the driver's hasher)
  - rows compared in emitted order first (the total-ORDER-BY contract);
    if that fails but sorted-row comparison passes, reported as ORDER-FAIL
  - floats via repr (bit-exact), Decimal via str (scale-sensitive, like a
    text hash would see), date/datetime via isoformat
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NULL"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)  # int, str, Decimal (keeps scale: '54.270000' != '54.27')


def fetch(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return [cols[i] for i in order], rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            gc, grows = fetch(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            wc, wrows = fetch(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}")
            n_fail += 1
            continue
        if grows == wrows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
            continue
        if sorted(grows) == sorted(wrows):
            print(f"ORDER-FAIL {name}: same multiset, different row order")
        else:
            print(f"FAIL {name}: value mismatch ({len(grows)} rows)")
            shown = 0
            for i, (g, w) in enumerate(zip(grows, wrows)):
                if g != w and shown < 3:
                    print(f"  row {i}:\n    spark  {g}\n    oracle {w}")
                    shown += 1
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
