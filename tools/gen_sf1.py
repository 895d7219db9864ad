#!/usr/bin/env python3
"""Generate a REAL sf1 (10x sf0.1) for the one-shot full-scale oracle sweep.

Unlike tools.GenScaleProxy (10 key-shifted copies of sf0.1 -- right for
scaling TRENDS, wrong for oracle verification because every row has 10 exact
clones), this draws every row independently with the same schemas, physical
parquet types (timestamp[us] everywhere since the 2026-08-13 testdata
regeneration -- events used to be INT64 TIMESTAMP(NANOS) and date columns
timestamp[ms]; Tables.events adapts to either events generation), key ranges
scaled 10x, and the same value distributions / category sets observed in the
driver's sf0.1. Deterministic (fixed numpy
seed, no clock). Verification infrastructure like tools/compare.py -- NOT
part of the engine; the Scala library never depends on it.

Usage: python3 tools/gen_sf1.py [/tmp/sf1real] [MULT]

MULT (round 12, VERDICT r11 item 1: "add a ladder rung above sf1") scales
every row count and key range by an integer factor — `gen_sf1.py /tmp/sf3real 3`
writes a true sf3 (30x the driver's sf0.1) with the same schemas and
distributions, so the crossover constants tuned at <= sf1 get re-proven a
rung higher. The numpy seed is fixed per MULT, so any rung regenerates
byte-identically.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1real"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 1
rng = np.random.default_rng(42)

N_CUST, N_SUPP, N_PART = 150_000 * MULT, 10_000 * MULT, 200_000 * MULT
N_ORDERS, N_LINE = 1_500_000 * MULT, 6_000_000 * MULT
N_EVENTS, N_DOCS, N_VECS = 1_000_000 * MULT, 50_000 * MULT, 20_000 * MULT
N_USERS = 15_000 * MULT

import os

os.makedirs(OUT, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"[gen-sf1] {name}: {table.num_rows} rows")


# region / nation: fixed dimensions at every scale factor (TPC-H convention)
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
}))

write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(
        ["MACHINERY", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE", "BUILDING"]
    )[rng.integers(0, 5, N_CUST)],
}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}))

adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
pk = np.arange(N_PART)
write("part", pa.table({
    "p_partkey": pa.array(pk, pa.int64()),
    "p_name": [f"{adjs[a]} {nouns[n]}" for a, n in
               zip(rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART))],
    "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, N_PART)],
    "p_type": np.array(
        ["ECONOMY", "MEDIUM", "PROMO", "SMALL", "LARGE", "STANDARD"]
    )[rng.integers(0, 6, N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": 900.0 + (pk % 1000) / 10.0,
}))

# orders: dates span the same 1995-01-01 .. 2001-08-01 window sf0.1 uses
# (cte_recursive's month spine is pinned to that window)
base_day = np.datetime64("1995-01-01")
o_date_days = rng.integers(0, 2405, N_ORDERS)
o_dates = base_day + o_date_days.astype("timedelta64[D]")
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
    "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORDERS)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
    "o_orderdate": pa.array(o_dates.astype("datetime64[us]"),
                            pa.timestamp("us")),
    "o_orderpriority": np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORDERS)],
}))

# lineitem: orderkeys drawn uniformly (every order exists); shipdate mostly
# orderdate + U[0,90)d with a 20% long-range tail, matching sf0.1's
# delta stats (avg ~48d, range spanning years)
l_ok = rng.integers(0, N_ORDERS, N_LINE)
near = rng.integers(0, 91, N_LINE)
far = rng.integers(-2400, 2500, N_LINE)
delta = np.where(rng.random(N_LINE) < 0.8, near, far)
ship_days = np.clip(o_date_days[l_ok] + delta, 0, 2500)
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_ok, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LINE), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LINE).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LINE), 2),
    "l_discount": rng.integers(0, 11, N_LINE) / 100.0,
    "l_tax": rng.integers(0, 9, N_LINE) / 100.0,
    "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, N_LINE)],
    "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, N_LINE)],
    "l_shipdate": pa.array(
        (base_day + ship_days.astype("timedelta64[D]")).astype("datetime64[us]"),
        pa.timestamp("us")),
}))

# events: timestamp[us] like the regenerated driver file (TIMESTAMP_NTZ in
# Spark; Tables.events derives ts_us via unix_micros); ts monotone in
# event_id with exponential gaps over ~30 days
gaps_ns = rng.exponential(2.592e9, N_EVENTS).astype(np.int64)
ts_ns = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64) \
    + np.cumsum(gaps_ns)
write("events", pa.table({
    "event_id": pa.array(range(N_EVENTS), pa.int64()),
    "ts": pa.array(ts_ns // 1000, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
    "event_type": np.array(["error", "view", "signup", "click", "purchase"])
    [rng.integers(0, 5, N_EVENTS)],
    "value": np.round(rng.uniform(0, 560, N_EVENTS), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)],
}))

# documents: same 31-word vocab, lang/source mixes and exact-dup structure
vocab = np.array(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split())
langs = np.array(["en", "zh", "de", "fr", "es"])
lang_p = np.array([0.41, 0.15, 0.14, 0.15, 0.15])
doc_langs = langs[rng.choice(5, N_DOCS, p=lang_p)]
doc_srcs = [f"src{s}" for s in rng.integers(0, 20, N_DOCS)]
texts = []
for i in range(N_DOCS):
    if i % 625 == 1 and texts:
        texts.append(texts[-1])  # exact duplicate of the previous doc
    else:
        n_words = rng.integers(8, 100)
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": texts,
    "lang": doc_langs,
    "source": doc_srcs,
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

# embeddings: 64-dim float32, near-N(0, 0.15) like sf0.1
emb = rng.normal(0, 0.15, (N_VECS, 64)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_VECS), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_VECS), pa.int32()),
}))

print(f"[gen-sf1] done -> {OUT}")
