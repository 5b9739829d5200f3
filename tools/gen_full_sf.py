"""Generate a full 10-table fixture at an arbitrary scale factor.

Purpose: cross-sf correctness sweeps at scales the driver does not ship
(`/root/testdata` has only sf{0.001,0.01,0.1} and is read-only). Parity
checking (Spark vs DuckDB on the SAME parquet) does not require
reproducing the driver's exact RNG stream — only schema fidelity and
the same marginal laws, so that tie density, skew, key ranges, and
overflow headroom behave like the real fixtures one or two decades up.

Laws below were measured from /root/testdata/sf0.1 (see the inline
notes); seed 42, deterministic. Scaling (rows at scale factor ``sf``):

- region 5, nation 25 (fixed dimensions, exact driver content)
- customer 150000*sf, supplier 10000*sf, part 200000*sf
- orders 1500000*sf (dense keys, date-granular o_orderdate 1995..2001-08)
- lineitem: lines per order ~ Poisson(4) (measured min 0 / max 17 /
  mean 4.0 — zero-line orders simply absent), l_linenumber uniform 1..7
  (measured: NOT sequential within order), l_partkey/l_suppkey uniform
  over their dimensions, l_shipdate independent uniform (measured
  triangular ship-order delta = difference of independent uniforms)
- events 1000000*sf: ts sorted uniform over 2024-01 (30 days, µs),
  user_id uniform 0..15000*sf-1, five event types, value ~ Exp(50),
  props = '{"k": <0..99>}'
- documents 50000*sf: 10..100 uniform words from the measured 31-word
  vocab, ~0.16% exact duplicates (measured 8/5000)
- embeddings 20000*sf: 64-dim unit-normalized gaussian, label ~ U{0..9}

Usage::

    python tools/gen_full_sf.py --sf 0.5 --out /tmp/sf0.5
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "MACHINERY", "FURNITURE", "BUILDING", "HOUSEHOLD"]
_STATUSES = ["F", "O", "P"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
# p_name pool: sf0.1 has 64 distinct two-word names like "large ring"
_PNAME_ADJ = ["large", "small", "red", "green", "blue", "dark", "light", "pale"]
_PNAME_NOUN = ["ring", "box", "case", "disk", "plate", "tube", "cap", "rod"]


def _day_us(lo: str, n_days: int, rng: np.random.Generator, n: int) -> np.ndarray:
    days = rng.integers(0, n_days, n).astype("timedelta64[D]")
    return (np.datetime64(lo) + days).astype("datetime64[us]")


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": _REGIONS,
            }
        ),
        f"{out}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        f"{out}/nation.parquet",
    )

    n_cust = int(150_000 * sf)
    ck = np.arange(n_cust, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": ck,
                "c_name": np.char.add("Customer#", np.char.zfill(ck.astype(str), 9)),
                "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
                "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
                "c_mktsegment": np.array(_SEGMENTS)[rng.integers(0, 5, n_cust)],
            }
        ),
        f"{out}/customer.parquet",
    )

    n_supp = int(10_000 * sf)
    sk = np.arange(n_supp, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": sk,
                "s_name": np.char.add("Supplier#", np.char.zfill(sk.astype(str), 9)),
                "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
            }
        ),
        f"{out}/supplier.parquet",
    )

    n_part = int(200_000 * sf)
    pk = np.arange(n_part, dtype=np.int64)
    adj = np.array(_PNAME_ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(_PNAME_NOUN)[rng.integers(0, 8, n_part)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pk,
                "p_name": np.char.add(np.char.add(adj, " "), noun),
                "p_brand": np.char.add(
                    "Brand#", rng.integers(1, 26, n_part).astype(str)
                ),
                "p_type": np.array(_TYPES)[rng.integers(0, 6, n_part)],
                "p_size": rng.integers(1, 51, n_part).astype(np.int32),
                "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 2),
            }
        ),
        f"{out}/part.parquet",
    )

    n_orders = int(1_500_000 * sf)
    ok = np.arange(n_orders, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": ok,
                "o_custkey": rng.integers(0, n_cust, n_orders),
                "o_orderstatus": np.array(_STATUSES)[rng.integers(0, 3, n_orders)],
                "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_orders), 2),
                "o_orderdate": _day_us("1995-01-01", 2405, rng, n_orders),
                "o_orderpriority": np.array(_PRIOS)[rng.integers(0, 5, n_orders)],
            }
        ),
        f"{out}/orders.parquet",
    )

    lines = rng.poisson(4.0, n_orders)
    lk = np.repeat(ok, lines)
    n = lk.shape[0]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": lk,
                "l_partkey": rng.integers(0, n_part, n),
                "l_suppkey": rng.integers(0, n_supp, n),
                "l_linenumber": rng.integers(1, 8, n).astype(np.int32),
                "l_quantity": rng.integers(1, 51, n).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n), 2),
                "l_discount": rng.integers(0, 11, n) / 100.0,
                "l_tax": rng.integers(0, 9, n) / 100.0,
                "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
                "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n)],
                "l_shipdate": _day_us("1995-01-02", 2499, rng, n),
            }
        ),
        f"{out}/lineitem.parquet",
    )

    n_ev = int(1_000_000 * sf)
    ts_us = np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n_ev, dtype=np.int64),
                "ts": (
                    np.datetime64("2024-01-01", "us")
                    + ts_us.astype("timedelta64[us]")
                ),
                "user_id": rng.integers(0, max(int(15_000 * sf), 1), n_ev),
                "event_type": np.array(_EVENT_TYPES)[rng.integers(0, 5, n_ev)],
                "value": np.round(rng.exponential(50.0, n_ev), 2),
                "props": np.char.add(
                    np.char.add('{"k": ', rng.integers(0, 100, n_ev).astype(str)),
                    "}",
                ),
            }
        ),
        f"{out}/events.parquet",
    )

    n_doc = int(50_000 * sf)
    vocab = np.array(_VOCAB)
    wc = rng.integers(10, 101, n_doc)
    flat = vocab[rng.integers(0, len(vocab), int(wc.sum()))]
    offs = np.concatenate(([0], np.cumsum(wc)))
    texts = [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(n_doc)]
    # ~0.16% exact duplicates (measured 8/5000 at sf0.1)
    for i in rng.choice(n_doc, max(int(0.0016 * n_doc), 1), replace=False):
        texts[i] = texts[int(rng.integers(0, n_doc))]
    langs = np.array(["en", "zh", "es", "fr", "de"])[
        rng.choice(5, n_doc, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(n_doc, dtype=np.int64),
                "text": texts,
                "lang": langs,
                "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        f"{out}/documents.parquet",
    )

    n_emb = int(20_000 * sf)
    v = rng.standard_normal((n_emb, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(n_emb, dtype=np.int64),
                "embedding": pa.array(list(v), pa.list_(pa.float32())),
                "label": rng.integers(0, 10, n_emb).astype(np.int32),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    print(f"wrote sf={sf} fixture ({n} lineitem rows) -> {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument("--out", default="/tmp/sf0.5")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    generate(args.sf, args.out, args.seed)
