"""Deterministic synthetic-data generator for SCALE testing (sf1+).

Mirrors the shapes/distributions of the driver-generated
``/root/testdata/sf*`` tables (TESTDATA.md) so the same queries + oracles
run unmodified at 10x bench scale — the driver's testdata is read-only and
tops out at sf0.1, so super-linear plan behavior has nowhere to show up
without this. NOT a copy of the driver's generator (unknown); only the
schemas must match exactly (the correctness gate compares Spark vs DuckDB
on whatever data it's given) and the distributions approximately (they
shape performance realism: join fan-outs, group cardinalities, dup rates).

Observed anchors from sf0.1 (see SCALE.md): lineitem = 6M/sf rows over
orders = 1.5M/sf with 1..17 lines (mean ~4.08); orders span 1995-01-01 ..
2001-08-01; documents = 50k/sf from the same 30-word vocab with ~5%
injected near-dups (+ 'dup' marker token) and ~0.16% exact dups; 20
sources, 5 langs (en 2x); embeddings = 20k/sf unit-normalized 64-dim with
10 labels and ~2% near-dup vectors; events = 1M/sf over a fixed 30-day
window (arrival DENSITY scales, the window doesn't) with 15k users/sf.

Usage: python scripts/gen_scale_data.py <sf> <out_dir>   (e.g. 1 .scale/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "sort", "fast", "row", "the", "agg", "key",
    "query", "a", "scan", "batch", "join", "hash", "filter", "group",
    "order", "line", "part", "customer", "slow", "large",
]
DUP_TOKEN = "dup"

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "en", "es", "fr", "zh"]  # en twice ~ observed 2x
P_NAMES_A = ["large", "hot", "blue", "red", "small", "green", "dark", "light"]
P_NAMES_B = ["ring", "bolt", "screw", "nut", "washer", "plate", "rod", "cap"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]

EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype("int64")
ORDER_SPAN_DAYS = 2404  # 1995-01-01 .. 2001-08-01
EVENTS_T0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
EVENT_WINDOW_US = 30 * 86_400_000_000  # fixed 30-day window at every sf


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def gen(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_sources = 20

    # --- region / nation (fixed, sf-independent) ---
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # --- supplier ---
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    # --- customer ---
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    # --- part ---
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{P_NAMES_A[a]} {P_NAMES_B[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1100, 2),
    }))

    # --- orders ---
    o_dates_us = EPOCH_1995 + (
        rng.integers(0, ORDER_SPAN_DAYS, n_ord) * 86_400_000_000
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        "o_orderdate": pa.array(o_dates_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # --- lineitem (1..17 lines per order, mean ~4.08) ---
    lines_per_order = np.clip(1 + rng.poisson(3.08, n_ord), 1, 17)
    l_orderkey = np.repeat(np.arange(n_ord), lines_per_order)
    n_li = len(l_orderkey)
    ship_delta_days = np.clip(rng.normal(48, 120, n_li), -2399, 2496).astype("int64")
    l_ship_us = np.repeat(o_dates_us, lines_per_order) + ship_delta_days * 86_400_000_000
    linenumbers = (
        np.arange(n_li) - np.repeat(np.cumsum(lines_per_order) - lines_per_order,
                                    lines_per_order) + 1
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumbers, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(l_ship_us, pa.timestamp("us")),
    }))

    # --- documents (vocab sentences + near-dup/exact-dup injection) ---
    vocab = np.array(VOCAB)
    texts: list[str] = []
    n_words = rng.integers(8, 100, n_docs)  # ~44..577 chars
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.0016:  # exact dup (~8 per 5000)
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.05:  # near dup: prior doc, few tokens swapped
            words = texts[rng.integers(0, i)].split(" ")
            for _ in range(max(1, len(words) // 20)):
                words[rng.integers(0, len(words))] = DUP_TOKEN
            texts.append(" ".join(words))
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words[i])]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_docs)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, n_sources, n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # --- embeddings (unit-normalized 64-dim float32, ~2% near-dups) ---
    dim = 64
    vecs = rng.normal(0, 1, (n_vecs, dim))
    n_dup = int(0.02 * n_vecs)
    dup_dst = rng.integers(n_dup, n_vecs, n_dup)  # overwrite later rows
    dup_src = rng.integers(0, n_dup, n_dup)
    vecs[dup_dst] = vecs[dup_src] + rng.normal(0, 0.01, (n_dup, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs32 = vecs.astype("float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs32.reshape(-1), pa.float32()), dim
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
    }))

    # --- events (fixed 30-day window; density scales with sf) ---
    ts_us = np.sort(rng.integers(0, EVENT_WINDOW_US, n_events)) + EVENTS_T0
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(rng.uniform(0.0, 600.0, n_events), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f".scale/sf{sys.argv[1]}"
    print(f"generating sf={sf} into {out}", flush=True)
    gen(sf, out)
    print("done", flush=True)
