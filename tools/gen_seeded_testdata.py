#!/usr/bin/env python3
"""Seeded-parity testdata generator (round-11 verdict task 3).

The committed corpora are FIXED (seed 42), so a float-parity seam that
only crosses a rounding boundary on *other* data — exactly how
`events_anova` failed the round-10 driver gate while passing every
committed scale factor — is invisible to the per-round sweeps. This
script regenerates the same star schema with the SAME schemas, value
families, and categorical sets but a DIFFERENT seed, giving the oracle
sweep a fresh-data gate each round (what the driver's own generator
effectively does).

Dev-harness only (numpy + pyarrow, like check_oracle.py's duckdb) —
the Scala library never depends on it.

Usage: gen_seeded_testdata.py <outDir> [seed] [scale]
  scale 1.0 ≈ sf0.001 row counts.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
STATUSES = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
VOCAB = ["batch", "data", "key", "table", "scan", "merge", "part",
         "window", "join", "slow", "agg", "order", "column", "a",
         "vector", "sort", "hash", "dup", "filter", "value", "big",
         "small", "group", "line", "stream", "query", "row", "the",
         "fast", "spark", "customer"]

DAY_US = 86_400_000_000


def cents2(rng, lo, hi, n):
    """2dp-quantized doubles (integer cents / 100) — the exactness
    contract every monetary column in the committed testdata obeys."""
    c = rng.integers(int(lo * 100), int(hi * 100) + 1, n)
    return (c / 100.0).astype(np.float64)


def main():
    out = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4242
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    def write(name, table):
        pq.write_table(table, f"{out}/{name}.parquet")

    n_cust = max(int(150 * scale), 10)
    n_supp = max(int(10 * scale), 3)
    n_part = max(int(200 * scale), 10)
    n_ord = max(int(1500 * scale), 50)
    n_li = max(int(6000 * scale), 100)
    n_ev = max(int(1000 * scale), 100)
    n_doc = max(int(500 * scale), 50)
    n_vec = max(int(500 * scale), 50)

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)],
                                pa.int32())}))
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": cents2(rng, -900, 9950, n_cust),
        "c_mktsegment": [SEGMENTS[i] for i in
                         rng.integers(0, 5, n_cust)]}))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": cents2(rng, -900, 9950, n_supp)}))
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in
                   zip(rng.integers(0, len(ADJS), n_part),
                       rng.integers(0, len(NOUNS), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 +
                                  np.arange(n_part) * 0.1, 2)}))

    base95 = np.datetime64("1995-01-01")
    odays = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": cents2(rng, 1000, 500000, n_ord),
        "o_orderdate": pa.array(
            (base95 + odays).astype("datetime64[us]")),
        "o_orderpriority": [PRIORITIES[i] for i in
                            rng.integers(0, 5, n_ord)]}))

    lok = rng.integers(0, n_ord, n_li)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": cents2(rng, 1000, 100000, n_li),
        "l_discount": np.round(
            rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [["A", "N", "R"][i] for i in
                         rng.integers(0, 3, n_li)],
        "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            (base95 + rng.integers(1, 2500, n_li))
            .astype("datetime64[us]"))}))

    base24 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ev_us = np.sort(base24 + rng.integers(0, 30 * DAY_US, n_ev))
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ev_us, pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, max(int(15 * scale), 5), n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": cents2(rng, 0, 330, n_ev),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)]}))

    n_src = 20
    texts = []
    for i in range(n_doc):
        n_words = int(rng.integers(8, 100))
        texts.append(" ".join(VOCAB[j] for j in
                              rng.integers(0, len(VOCAB), n_words)))
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, n_src, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    emb = (rng.random((n_vec, 64), dtype=np.float64) - 0.5) * 0.5
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32())}))
    print(f"wrote seed={seed} scale={scale} -> {out}")


if __name__ == "__main__":
    main()
