"""Regression tests for the four round-6 external-review (ADVICE) defects.

Each test reproduces the exact data shape the review called latent —
absent from the sf0.001/0.01/0.1 fixtures but reachable at other scales
or with other data — and pins the fixed behavior against the same
DuckDB oracle the driver uses.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dmi_ingestor_spark.registry import load_all
from tools.oracle_check import compare, normalize

REGISTRY = load_all()


def _duck_for(dirpath: str, tables: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirpath}/{t}.parquet'"
        )
    return con


def _run_both(name: str, spark, dirpath: str, tables: list[str]):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, dirpath).toPandas()
    ddf = _duck_for(dirpath, tables).execute(spec.oracle).fetchdf()
    problems = compare(name, normalize(sdf), normalize(ddf))
    assert not problems, f"{name}: {problems}"
    return sdf


def test_bom_explosion_depth_beyond_fixed_rounds(spark, tmp_path):
    """ADVICE #1 (graph.py): the descent previously stopped at 7 rounds
    while the WITH RECURSIVE oracle is unbounded. A part-key domain
    reaching 4^9 forces depth-9 paths; the loop must discover the depth
    from the data (frontier-empty break), not a constant."""
    # full subtree keys 4..1023 (depth 4 under anc=1) plus a single
    # chain 1024 -> 4096 -> ... -> 262144 extending anc=1 paths to
    # depth 9 — the exact shape the 7-round cap truncated
    keys = list(range(4, 1024)) + [1024, 4096, 16384, 65536, 262144]
    pd.DataFrame({"p_partkey": keys}).to_parquet(
        str(tmp_path / "part.parquet")
    )
    sdf = _run_both("graph_bom_explosion", spark, str(tmp_path), ["part"])
    assert int(sdf["max_depth"].max()) == 9


def test_gorilla_oracle_orders_ties_like_the_encoder(spark, tmp_path):
    """ADVICE #2 (ingestion.py): epoch-ms ties within an event_type must
    not let the oracle's pdelta window reorder deltas relative to the
    encoded (ts_ms, event_id)-ordered series."""
    rows = []
    # event_type 'a': deliberate ts ties with event_ids interleaved so
    # that any (ts_ms, cents) ordering differs from (ts_ms, event_id)
    ties = [
        (1, 1000, 9.0),
        (2, 1000, 3.0),  # tie at 1000ms, cents descend vs event_id
        (3, 1000, 7.0),
        (4, 2000, 7.0),
        (5, 2000, 1.0),
        (6, 3000, 1.0),
        (7, 4000, 5.0),
        (8, 4000, 5.0),
    ]
    for eid, ms, val in ties:
        rows.append((eid, pd.Timestamp(ms, unit="ms"), eid * 10, "a", val, "{}"))
    # a second type with no ties: the control series
    for i, eid in enumerate(range(100, 110)):
        rows.append(
            (eid, pd.Timestamp(5000 + 100 * i, unit="ms"), eid, "b", float(i), "{}")
        )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(tmp_path / "events.parquet"))
    _run_both("ingest_gorilla_timeseries", spark, str(tmp_path), ["events"])


def test_roaring_container_missing_one_predicate_side(spark, tmp_path):
    """ADVICE #3 (bucketing.py): a 4096-key container whose rows satisfy
    only one of the two predicates previously crashed encode_container
    with a NULL offset list; the oracle's inner join just drops it.
    Both sides must drop it."""
    # container 0: both predicates present (status F keys + off < 512)
    keys = list(range(1, 600))
    status = ["F" if k % 2 else "O" for k in keys]
    # container 2 (keys 8192..): only off >= 512 and NO status-F rows
    # -> predicate A (status F) empty AND predicate B (off < 512) empty
    # for one side each:
    #   container 2: all status O, offs < 512  -> only predicate B
    keys2 = list(range(8192, 8300))
    status2 = ["O"] * len(keys2)
    #   container 3: all status F, offs >= 512 -> only predicate A
    keys3 = list(range(12288 + 600, 12288 + 700))
    status3 = ["F"] * len(keys3)
    all_keys = keys + keys2 + keys3
    all_status = status + status2 + status3
    pd.DataFrame(
        {
            "o_orderkey": all_keys,
            "o_custkey": [1] * len(all_keys),
            "o_orderstatus": all_status,
            "o_totalprice": [1.0] * len(all_keys),
            "o_orderdate": [pd.Timestamp("2024-01-01")] * len(all_keys),
            "o_orderpriority": ["1-URGENT"] * len(all_keys),
        }
    ).to_parquet(str(tmp_path / "orders.parquet"))
    sdf = _run_both(
        "layout_roaring_bitmap_index", spark, str(tmp_path), ["orders"]
    )
    # the one-sided containers (2 and 3) are dropped, not crashed on
    assert set(sdf["container"]) == {0}


def test_read_pruned_fully_pruned_keeps_logical_names(spark, tmp_path):
    """ADVICE #4 (txlog.py): a fully-pruned read on a column-mapped
    (renamed) table must expose LOGICAL column names on the empty
    frame, exactly as TxLog.read does."""
    from dmi_ingestor_spark.catalog import table as cat_table
    from dmi_ingestor_spark.ingest.txlog import (
        TxLog,
        append_with_stats,
        read_pruned,
    )

    tx = TxLog(spark, str(tmp_path / "tbl"))
    df = (
        cat_table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )
    append_with_stats(tx, df, "u0", "o_orderkey")
    tx.rename_column("o_totalprice", "order_value")
    # range below every recorded key -> every unit pruned
    pruned = read_pruned(tx, -10, -1)
    assert pruned.count() == 0
    assert pruned.columns == tx.read().columns
    assert "order_value" in pruned.columns
    assert "o_totalprice" not in pruned.columns


def test_bollinger_bands_survives_2e19_var_num(spark, tmp_path):
    """r7 sf0.5 cross-sf sweep catch: n*sxx - sx^2 itself passes 2^63
    once monthly totals reach ~2.3e12 cents, so the old BIGINT cast
    raised CAST_OVERFLOW on Spark (and would raise in DuckDB). var_num
    is now emitted as the exact DECIMAL(38,0)/HUGEINT digit string and
    the band test uses the multiply-by-4 form (Spark `div` returns
    BIGINT and overflowed on the squared term)."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 240  # 20 orders x 12 months, totals ~5e9 each -> x ~ 1e11
    months = np.repeat(np.arange(12), 20)
    pd.DataFrame(
        {
            "o_orderdate": (
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(months * 31, unit="D")
            ).astype("datetime64[us]"),
            "o_totalprice": rng.uniform(4.9e9, 5.1e9, n),
        }
    ).to_parquet(str(tmp_path / "orders.parquet"))
    sdf = _run_both("ts_bollinger_bands", spark, str(tmp_path), ["orders"])
    # the overflow regime is actually reached: some var_num has >19 digits
    assert sdf["var_num"].astype(str).str.len().max() >= 19


def test_substring_containment_is_token_aligned(spark, tmp_path):
    """r7 self-audit catch: the unpadded char-level verify admitted
    mid-token containments ('data agg ...' contains 'a agg ...') that
    the first-3-token-shingle blocking cannot see — Spark and the
    oracle would diverge on any fixture with vocabulary suffix
    overlaps. Both engines now test space-padded token-aligned
    containment, under which the blocking is provably lossless."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "data agg batch big column",
                "a agg batch big column",   # mid-token inside doc 1 only
                "agg batch big",            # token-aligned inside 1 AND 2
                "zz yy xx",                 # contained nowhere
            ],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    sdf = _run_both(
        "dedup_substring_containment", spark, str(tmp_path), ["documents"]
    )
    pairs = set(zip(sdf["container_id"], sdf["contained_id"]))
    assert (1, 3) in pairs and (2, 3) in pairs
    assert (1, 2) not in pairs  # mid-token match must be excluded
