"""Generate sf1-scale customer/lineitem fixtures for the spot-bench of
the two steepest-slope queries (VERDICT r6 item 3).

/root/testdata is read-only and has no sf1, so this reproduces the
driver fixtures' observed generation law one decade up (seed 42,
deterministic):

- customer: 150000*sf rows, keys 0..n-1, names ``Customer#%09d``
  (verified against sf0.001/0.01/0.1: counts 150/1500/15000, dense
  sequential keys, that exact name format).
- lineitem: 1500000*sf orders, lines per order ~ 1 + Poisson(3)
  (sf0.1 histogram: range 1..17, mean 4.0, mode 3-4), l_partkey
  uniform over 0..200000*sf-1 (sf0.1 per-part counts: min 11 max 53
  mean 30 — multinomial-uniform).

Only the columns the two spot queries read are emitted; parquet is
columnar, so absent columns change nothing for them.

Usage::

    python tools/gen_sf1_spot.py [--sf 1.0] [--out /tmp/sf1_spot]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    keys = np.arange(n_cust, dtype=np.int64)
    names = np.char.add(
        "Customer#", np.char.zfill(keys.astype(str), 9)
    )
    segments = np.array(
        ["AUTOMOBILE", "MACHINERY", "FURNITURE", "BUILDING", "HOUSEHOLD"]
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": keys,
                "c_name": names,
                "c_mktsegment": segments[rng.integers(0, 5, n_cust)],
                "c_acctbal": np.round(rng.uniform(-999.85, 9999.8, n_cust), 2),
            }
        ),
        f"{out}/customer.parquet",
    )

    n_orders = int(1_500_000 * sf)
    n_parts = int(200_000 * sf)
    lines = 1 + rng.poisson(3.0, n_orders)
    orderkeys = np.repeat(np.arange(n_orders, dtype=np.int64), lines)
    n = orderkeys.shape[0]
    partkeys = rng.integers(0, n_parts, n, dtype=np.int64)
    # value columns matching the observed sf0.1 marginals (uniform
    # quantity 1..50, discount/tax on cent grids, ~uniform flag/status,
    # shipdate over the 1995-2001 span) — enough for the scan-agg
    # spot queries (q1-shaped) to be representative at sf1
    quantity = rng.integers(1, 51, n).astype(np.float64)
    extprice = np.round(rng.uniform(900.0, 105000.0, n), 2)
    discount = rng.integers(0, 11, n) / 100.0
    tax = rng.integers(0, 9, n) / 100.0
    returnflag = np.array(["A", "N", "R"])[rng.integers(0, 3, n)]
    linestatus = np.array(["F", "O"])[rng.integers(0, 2, n)]
    shipdate = np.datetime64("1995-01-02") + rng.integers(
        0, 2500, n
    ).astype("timedelta64[D]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": orderkeys,
                "l_partkey": partkeys,
                "l_suppkey": partkeys % max(int(10_000 * sf), 1),
                "l_linenumber": np.ones(n, dtype=np.int32),
                "l_quantity": quantity,
                "l_extendedprice": extprice,
                "l_discount": discount,
                "l_tax": tax,
                "l_returnflag": returnflag,
                "l_linestatus": linestatus,
                "l_shipdate": shipdate.astype("datetime64[us]"),
            }
        ),
        f"{out}/lineitem.parquet",
    )
    # orders: one row per order, o_custkey uniform over customers,
    # o_totalprice on the cent grid (sf0.1 marginals) — feeds the r8
    # caliper-matching spot row (outcome = per-customer spend sum).
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(n_orders, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_orders, dtype=np.int64),
                "o_totalprice": np.round(
                    rng.uniform(850.0, 560000.0, n_orders), 2
                ),
            }
        ),
        f"{out}/orders.parquet",
    )
    print(
        f"wrote sf={sf}: customer={n_cust} lineitem={n} "
        f"orders={n_orders} -> {out}"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/sf1_spot")
    args = ap.parse_args()
    generate(args.sf, args.out)
