"""Synthesize a larger-scale replica of the driver testdata for PERF
measurement (guide §1: "optimizations must hold at both sizes").

/root/testdata is read-only and ships only sf0.001/0.01/0.1, but the
driver's round-end MEASUREMENT runs at a larger driver-generated sf
(BENCH_r05.json: sf1.0). This tool extrapolates the observed schemas and
distributions (same 31-word vocab, same per-table scaling rules measured
across the three shipped sfs) so optimization A/Bs can be validated at
the measurement scale. Deterministic (numpy PCG64, fixed seed); NOT used
by any query, oracle, or the frozen bench methodology — measurement
tooling only.

Usage: python tools/gen_scale_testdata.py [sf] [out_base]
  default sf=1.0, out_base=/dev/shm/synthdata  ->  /dev/shm/synthdata/sf1.0/
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "en", "en", "en", "de", "es", "fr", "zh"]  # en ~40% as observed
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"wrote {path}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    base = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/synthdata"
    out_dir = os.path.join(base, f"sf{sf:g}")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    # ---- scaling rules measured on sf0.001/0.01/0.1 ----
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation: fixed dimensions
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    segs = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": [segs[i] for i in rng.integers(0, 5, n_cust)],
    }))
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    adjs = ["large", "hot", "blue", "dim", "smoke", "metal", "soft", "cold"]
    nouns = ["ring", "bolt", "case", "drum", "plate", "wheel", "clip", "rod"]
    types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25}" for i in rng.integers(0, 25, n_part)],
        "p_type": [types[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))

    day_ms = 86_400_000
    base_1995 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    odate = base_1995 + rng.integers(0, 2404, n_orders) * day_ms
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": [("O", "P", "F")[i] for i in rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(900, 500000, n_orders), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": [
            ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")[i]
            for i in rng.integers(0, 5, n_orders)
        ],
    }))

    l_ok = np.sort(rng.integers(0, n_orders, n_line))
    sdate = base_1995 + rng.integers(1, 2500, n_line) * day_ms
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
        "l_linenumber": pa.array((np.arange(n_line) % 7) + 1, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": [("R", "N", "A")[i] for i in rng.integers(0, 3, n_line)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n_line)],
        "l_shipdate": pa.array(sdate, pa.timestamp("ms")),
    }))

    base_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ets = base_2024 + np.sort(rng.integers(0, 30 * 86_400_000_000, n_events))
    write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(15_000 * sf), n_events), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_events)],
        "value": np.round(rng.exponential(50.0, n_events), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
    }))

    # documents: uniform words over the tiny vocab — this reproduces the
    # minhash mega-bucket structure the driver corpus shows at sf1.0
    lens = rng.integers(10, 101, n_docs)
    widx = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in widx[pos:pos + ln]))
        pos += ln
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n_docs)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int32()),
    }))

    # embeddings: 64-dim unit-ish vectors in 10 label clusters
    centers = rng.normal(0, 0.1, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.15, (n_emb, 64))
    vecs = np.clip(vecs, -0.58, 0.58).astype(np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
