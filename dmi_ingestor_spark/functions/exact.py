"""Deterministic aggregation helpers for oracle parity.

Floating-point SUM/AVG depend on accumulation order, which differs
between Spark's partial/final hash aggregate and DuckDB's aggregate —
the last few ulps of a 600k-row double sum are not reproducible. The
oracle comparison is an exact value-hash, so every money/measure
aggregate in this engine goes through *exact decimal arithmetic*:

    sum_money(x)  ==  CAST(SUM(CAST(x AS DECIMAL(22,8))) AS DOUBLE)

Casting each (deterministic, IEEE-754) double to DECIMAL(22,8) is
order-independent, the decimal sum is exact integer arithmetic, and the
final cast back to DOUBLE is deterministic — so Spark and DuckDB agree
bit-for-bit. This is also the right call at 100 TB: decimal partial
aggregates are still map-side combinable and whole-stage-codegen'd;
there is no performance cliff versus double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 8: products of up to three 2-decimal factors have <= 6 exact
# fractional digits, so an 8-digit cast never rounds at a half-way
# boundary (where Spark HALF_UP and DuckDB could disagree). 14 integer
# digits covers values up to 1e14.
DEC = "decimal(22,8)"


def sum_exact(col: Column | str, alias: str) -> Column:
    """Order-independent double SUM via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def avg_exact(col: Column | str, alias: str) -> Column:
    """Order-independent double AVG: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_sum_exact(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`sum_exact`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(22,8))) AS DOUBLE) AS {alias}"


def sql_avg_exact(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`avg_exact`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(22,8))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
