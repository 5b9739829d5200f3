"""Deterministic aggregation helpers for oracle parity.

Floating-point SUM/AVG depend on accumulation order, which differs
between Spark's partial/final hash aggregate and DuckDB's aggregate —
the last few ulps of a 600k-row double sum are not reproducible. The
oracle comparison is an exact value-hash, so every money/measure
aggregate in this engine goes through *exact decimal arithmetic*:

    sum_money(x)  ==  to_double(SUM(CAST(x AS DECIMAL(22,8))))

Casting each (deterministic, IEEE-754) double to DECIMAL(22,8) is
order-independent and the decimal sum is exact integer arithmetic. The
FINAL decimal→double conversion is the subtle part: once the unscaled
value (sum × 10^8) exceeds 2^53, a naive ``CAST(dec AS DOUBLE)`` is no
longer exactly representable and engines round differently (Spark goes
through BigDecimal → correctly-rounded; DuckDB converts the unscaled
integer to double FIRST and then divides by 10^scale — two roundings).
Observed at sf0.1: sums ≥ ~1e8 differ in the last ulp. So the
conversion is split into two pieces that each convert exactly the same
way in both engines:

    to_double(S) = CAST(FLOOR(S) AS DOUBLE)      -- integer part
                 + CAST(S - FLOOR(S) AS DOUBLE)  -- fraction, unscaled < 1e8

Both addends are identical bit patterns in both engines (integer→double
is correctly rounded everywhere; the fraction's unscaled value fits in
53 bits), and one IEEE addition of identical inputs is deterministic —
so the result is bit-identical at ANY magnitude, not just below 2^53.

This is also the right call at 100 TB: decimal partial aggregates are
map-side combinable and whole-stage-codegen'd; the split conversion is
two scalar ops on the final row per group.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 8: products of up to three 2-decimal factors have <= 6 exact
# fractional digits, so an 8-digit cast never rounds at a half-way
# boundary (where Spark HALF_UP and DuckDB could disagree). 14 integer
# digits covers values up to 1e14.
DEC = "decimal(22,8)"


def dec_to_double(s: Column) -> Column:
    """Decimal → double, bit-identical across engines at any magnitude
    (see module docstring: split integer/fraction conversion)."""
    return F.floor(s).cast("double") + (s - F.floor(s)).cast("double")


def sql_dec_to_double(s: str) -> str:
    """DuckDB twin of :func:`dec_to_double`."""
    return f"(CAST(FLOOR({s}) AS DOUBLE) + CAST({s} - FLOOR({s}) AS DOUBLE))"


def sum_exact(col: Column | str, alias: str) -> Column:
    """Order-independent double SUM via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_to_double(F.sum(c.cast(DEC))).alias(alias)


def avg_exact(col: Column | str, alias: str) -> Column:
    """Order-independent double AVG: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (dec_to_double(F.sum(c.cast(DEC))) / F.count(c)).alias(alias)


def sql_sum_exact(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`sum_exact`."""
    s = f"SUM(CAST({expr} AS DECIMAL(22,8)))"
    return f"{sql_dec_to_double(s)} AS {alias}"


def sql_avg_exact(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`avg_exact`."""
    s = f"SUM(CAST({expr} AS DECIMAL(22,8)))"
    return f"{sql_dec_to_double(s)} / COUNT({expr}) AS {alias}"


# 2^53: the largest power of two below which every integer is exactly a
# double. Integers above it (big power sums, HUGEINT/decimal(38,0))
# convert to double differently across engines (DuckDB's HUGEINT→double
# goes through two limbs with two roundings; Spark's BigDecimal path is
# correctly rounded), so the conversion is split into two exactly-
# representable limbs: x = hi*2^53 + lo with |lo| < 2^53 and hi the
# truncating quotient — then hi*2^53 and +lo are single IEEE ops on
# identical operands in both engines.
I53 = 9_007_199_254_740_992


def int_to_double(x: Column) -> Column:
    """Exact-integer decimal → double, bit-identical across engines at
    any magnitude up to 2^106 (hi itself must stay under 2^53)."""
    lo = x % F.lit(I53)
    hi = ((x - lo) / F.lit(I53)).cast("double")
    return hi * F.lit(float(I53)) + lo.cast("double")


def sql_int_to_double(s: str) -> str:
    """DuckDB twin of :func:`int_to_double` (use on HUGEINT sums)."""
    return (
        f"(CAST((({s}) - (({s}) % {I53})) // {I53} AS DOUBLE) * {I53}.0"
        f" + CAST(({s}) % {I53} AS DOUBLE))"
    )
