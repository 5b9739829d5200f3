"""Bucketed-table co-located joins (SURVEY.md §2.3 J-scale / §7.4).

At 100 TB the dominant cost of a fact⋈fact equi-join (orders⋈lineitem)
is the pairwise shuffle of both tables. Spark's answer is bucketed
storage: both tables written with ``bucketBy(N, key)`` hash-place rows
so bucket i of one table can only match bucket i of the other — the
join then runs with ZERO Exchange on either side (asserted in
``tests/test_bucketing.py``), turning the nightly big join into a
map-side merge. This module owns the write/read plumbing; the engine's
recommendation is: bucket the largest fact tables on their join key at
ingest time, pick N ≈ cluster cores × small multiple, and keep N stable
so every downstream join co-locates for free.

Spark bucketing requires the table catalog (``saveAsTable``), not bare
parquet paths — bucket metadata lives in the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """(Over)write ``df`` as a bucketed, optionally sorted, managed table.

    The input is repartitioned by the bucket column first so each
    bucket holds exactly one file (no small-files problem, and a
    prerequisite for the sorted-scan path). Note: since Spark 3.0 the
    planner re-sorts bucketed scans regardless (on-disk order is only
    trusted behind spark.sql.legacy.bucketedTableScan.outputOrdering),
    so bucketing eliminates the EXCHANGE — the expensive part — while
    the per-bucket Sort remains and is cheap/local.
    """
    writer = (
        df.repartition(n_buckets, df[bucket_col])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def ensure_bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 8,
) -> tuple[str, str]:
    """Bucketed orders/lineitem twins for ``sf_dir``, created once.

    Table names are keyed by a stable hash of (sf_dir, n_buckets) so
    different scale factors coexist; re-runs within a process reuse the
    existing tables (the data under a given sf_dir is immutable test
    data). The process id is part of the key because the managed-table
    warehouse directory is shared by cwd: two harness processes (e.g.
    pytest + plan_audit) building the same table name concurrently
    would otherwise overwrite each other's files mid-read.
    """
    import hashlib
    import os

    suffix = hashlib.md5(
        f"{sf_dir}|{n_buckets}|{os.getpid()}".encode()
    ).hexdigest()[:8]
    t_orders = f"b_orders_{suffix}"
    t_lineitem = f"b_lineitem_{suffix}"
    catalog = spark.catalog
    if not catalog.tableExists(t_orders) or not catalog.tableExists(t_lineitem):
        # A previous session's warehouse directory can outlive the
        # in-memory catalog; clear any orphaned location before writing
        # (managed-table writes refuse to reuse an existing path).
        from dmi_ingestor_spark.ingest.fs import fs_delete, fs_exists

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        for name in (t_orders, t_lineitem):
            loc = os.path.join(warehouse, name)
            if not catalog.tableExists(name) and fs_exists(spark, loc):
                fs_delete(spark, loc)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_bucketed(orders, t_orders, "o_orderkey", n_buckets, "o_orderkey")
        write_bucketed(
            lineitem, t_lineitem, "l_orderkey", n_buckets, "l_orderkey"
        )
    return t_orders, t_lineitem


def ensure_partitioned_orders(spark, sf_dir: str) -> str:
    """A partitioned-by-priority copy of orders for ``sf_dir``, written
    once to a stable temp location (hive-style ``o_orderpriority=...``
    directories). This is the layout dynamic partition pruning needs:
    the partition column must be a DIRECTORY key, not a parquet column,
    for a dimension-side filter to skip whole partitions at runtime."""
    import hashlib
    import os
    import tempfile

    suffix = hashlib.md5(f"{sf_dir}|dpp|{os.getpid()}".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"dmi-dpp-orders-{suffix}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(path)
        )
    return path
