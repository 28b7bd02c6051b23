#!/usr/bin/env python3
"""Local tri-scale data generator for SCALING-CURVATURE measurement only.

Generates sf-scaled twins of the driver's testdata schema (same columns,
same value families, same dup/near-dup structure) under /tmp/graftdata/sfX.
The point is measuring how each bench query's wall time grows with data
size when ALL THREE scales come from ONE generator — the driver's own
sf0.1 stays the official bench input; these dirs exist only so
BASELINE.md can report time-vs-sf slopes (scripts/bench_scaling.py).

NOT part of the library; driver-side python/numpy/pyarrow only.

Usage: python3 scripts/gen_scale.py 0.1 0.33 1.0
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/tmp/graftdata"
REAL = "/root/testdata/sf0.01"  # value families sampled from here

VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "a", "the", "merge", "batch", "spark", "line",
         "sort", "window", "order", "data", "column", "join", "small",
         "customer", "query", "big", "stream", "filter", "group", "vector",
         "grid"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.436, 0.15, 0.146, 0.14, 0.128]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "MEDIUM", "LARGE", "PROMO"]
PADJ = ["small", "red", "blue", "hot", "green", "dark", "pale", "big"]
PNOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "sprocket", "cap"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["purchase", "error", "view", "click", "signup"]

DAY_NS = 86_400_000_000_000


def write(out_dir, name, table):
    pq.write_table(table, f"{out_dir}/{name}.parquet")


def gen(sf):
    rng = np.random.default_rng(42_000 + int(sf * 1000))
    out = f"{BASE}/sf{sf:g}"
    import os
    os.makedirs(out, exist_ok=True)

    # region / nation: fixed tiny dims — copy the real ones verbatim
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{REAL}/{t}.parquet"), f"{out}/{t}.parquet")

    ncust = int(150_000 * sf)
    nsupp = int(10_000 * sf)
    npart = int(200_000 * sf)
    nord = int(1_500_000 * sf)
    nevt = int(1_000_000 * sf)
    ndoc = int(50_000 * sf)
    nvec = int(20_000 * sf)

    ck = np.arange(ncust, dtype=np.int64)
    write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": rng.integers(0, 25, ncust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(0, 10_000, ncust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, ncust)]),
    }))

    sk = np.arange(nsupp, dtype=np.int64)
    write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": rng.integers(0, 25, nsupp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(0, 10_000, nsupp), 2),
    }))

    pk = np.arange(npart, dtype=np.int64)
    write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array([f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}" for i in pk]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(0, 25, npart)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, npart)]),
        "p_size": rng.integers(1, 51, npart).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * pk, 2),
    }))

    ok = np.arange(nord, dtype=np.int64)
    d0 = np.datetime64("1995-01-01")
    odate = d0 + rng.integers(0, 2404, nord).astype("timedelta64[D]")
    write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, ncust, nord),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, nord)]),
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, nord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, nord)]),
    }))

    # lineitem: 1-7 lines per order (avg 4) + ~10% re-emitted dup keys with
    # fresh payloads (the q11 dup corpus shape)
    lines_per = rng.integers(1, 8, nord)
    lok = np.repeat(ok, lines_per)
    lln = np.concatenate([np.arange(1, n + 1) for n in lines_per])
    ndup = int(len(lok) * 0.10)
    dup_idx = rng.choice(len(lok), ndup, replace=False)
    lok = np.concatenate([lok, lok[dup_idx]])
    lln = np.concatenate([lln, lln[dup_idx]]).astype(np.int32)
    nli = len(lok)
    ship = (odate.astype("datetime64[D]")[
        np.concatenate([np.repeat(np.arange(nord), lines_per),
                        np.repeat(np.arange(nord), lines_per)[dup_idx]])]
        + rng.integers(1, 95, nli).astype("timedelta64[D]"))
    write(out, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, npart, nli),
        "l_suppkey": rng.integers(0, nsupp, nli),
        "l_linenumber": lln,
        "l_quantity": rng.integers(1, 51, nli).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(901, 100_000, nli), 2),
        "l_discount": np.round(rng.integers(0, 11, nli) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, nli) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["R", "A", "N"])[rng.integers(0, 3, nli)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, nli)]),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    }))

    # events: increasing ns timestamps over 30 days (TIMESTAMP_NS on disk,
    # like the driver's — exercises Tables.load's nanosAsLong path)
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
    gaps = rng.integers(1, 2 * 30 * DAY_NS // max(nevt, 1), nevt)
    ts = t0 + np.cumsum(gaps)
    write(out, "events", pa.table({
        "event_id": np.arange(nevt, dtype=np.int64),
        "ts": pa.array(ts.astype("datetime64[ns]"), type=pa.timestamp("ns")),
        "user_id": rng.integers(0, max(ncust // 10, 1), nevt),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, nevt)]),
        "value": np.round(rng.uniform(0.01, 500, nevt), 2),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, nevt)]),
    }))

    # documents: 10-99 tokens from the 31-word vocab — near-dups arise from
    # the small vocabulary exactly as in the driver's corpus
    ntok = rng.integers(10, 100, ndoc)
    flat = rng.integers(0, len(VOCAB), ntok.sum())
    texts, pos = [], 0
    va = np.array(VOCAB)
    for n in ntok:
        texts.append(" ".join(va[flat[pos:pos + n]]))
        pos += n
    write(out, "documents", pa.table({
        "doc_id": np.arange(ndoc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, ndoc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, ndoc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 10 LOOSE gaussian clusters (within-cluster cosine ~0.3,
    # below near-dup thresholds — cluster membership is for IVF recall,
    # not duplication) plus an explicit 5% near-dup tail (tight copies of
    # earlier vectors). Near-dup density per vector is then CONSTANT in
    # corpus size, so pair counts scale linearly — a generator whose
    # clusters are tight makes the correct near-dup OUTPUT quadratic and
    # poisons the curvature measurement (first-cut lesson).
    cent = rng.normal(0, 1, (10, 64))
    lab = rng.integers(0, 10, nvec)
    emb = (cent[lab] + rng.normal(0, 1.5, (nvec, 64))).astype(np.float32)
    ndup_v = nvec // 20
    src = rng.integers(0, max(nvec - ndup_v, 1), ndup_v)
    emb[-ndup_v:] = emb[src] + rng.normal(0, 0.05, (ndup_v, 64)).astype(np.float32)
    lab[-ndup_v:] = lab[src]
    write(out, "embeddings", pa.table({
        "vec_id": np.arange(nvec, dtype=np.int64),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": lab.astype(np.int32),
    }))
    print(f"sf{sf:g}: customers={ncust} orders={nord} lineitem={nli} "
          f"events={nevt} docs={ndoc} vecs={nvec} -> {out}")


if __name__ == "__main__":
    for sf in [float(a) for a in sys.argv[1:]] or [0.1, 0.33, 1.0]:
        gen(sf)
