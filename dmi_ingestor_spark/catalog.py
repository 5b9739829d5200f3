"""Table catalog: the driver's synthetic star schema (TESTDATA.md).

The reference's implicit "catalog" is an object-store prefix layout
(``dmi_ingestor/ingestor.py:159-161``); ours is a set of Parquet tables
read through the vectorized Parquet reader so Catalyst gets column
pruning + predicate pushdown for free (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table.

    Plain ``spark.read.parquet`` — no schema override, so the scan stays
    on the vectorized reader and pushdown-capable path. At cluster scale
    the same call reads a partitioned directory tree; nothing here
    assumes a single file.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md), which the
        # Spark 4 reader rejects outright. Read it as raw nanos and
        # truncate to the engine's µs timestamp — `ts div 1000` stays in
        # 64-bit integer arithmetic (a double division would lose
        # precision at 1e18 ns) and matches DuckDB's ns→µs truncation.
        # Guarded on the physical type: an events table written by THIS
        # engine already has a µs timestamp and must pass through as-is.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
