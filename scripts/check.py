#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [q1,q2,...]

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

Then a PANDAS-DTYPE PARITY pass (round-4 postmortem: the driver hashes
pandas frames, so DuckDB HUGEINT -> float64 coercion red-flags queries
whose typed values are identical). Both sides go through .df(); the dtype
vectors must match exactly and contain no object-array / Decimal /
unhashable cells that would crash or skew the driver's lexsort+hash.
"""
import decimal
import json, sys
import duckdb
import numpy as np


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


def dtype_report(df):
    """Per-column pandas dtype plus a scan for driver-hostile cell types.

    Returns (dtypes: {col: dtype_str}, problems: [str]). The driver sorts
    and hashes the pandas frame, so any unhashable cell (ndarray, list) is
    a crash and any Decimal cell hashes by object repr — both forbidden.
    """
    dtypes = {c: str(df[c].dtype) for c in df.columns}
    problems = []
    for c in df.columns:
        if dtypes[c] == "object":
            for v in df[c].head(50):
                if isinstance(v, (np.ndarray, list, dict)):
                    problems.append(f"{c}: unhashable {type(v).__name__} cell")
                    break
                if isinstance(v, decimal.Decimal):
                    problems.append(f"{c}: Decimal cell (coercion-dependent)")
                    break
    return dtypes, problems


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_src = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            gc, grows = fetch(con.sql(spark_src))
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
        if grows != wrows:
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
            continue
        # Typed values identical -> dtype parity (what the driver hashes).
        try:
            gdt, gprob = dtype_report(con.sql(spark_src).df())
            wdt, wprob = dtype_report(con.sql(sql).df())
        except Exception as e:
            print(f"DTYPE-FAIL {name}: .df() raised {str(e)[:200]}")
            n_fail += 1
            continue
        if gdt != wdt:
            diff = {c: (gdt.get(c), wdt.get(c))
                    for c in set(gdt) | set(wdt) if gdt.get(c) != wdt.get(c)}
            print(f"DTYPE-FAIL {name}: spark-vs-oracle pandas dtypes {diff}")
            n_fail += 1
            continue
        if gprob or wprob:
            print(f"DTYPE-FAIL {name}: spark={gprob} oracle={wprob}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
