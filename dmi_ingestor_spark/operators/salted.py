"""Skew-salted join (SURVEY.md §4.2 / brief: 'salting for skew').

AQE's skew-join handles most skew at runtime by splitting oversized
post-shuffle partitions, but it cannot split a single hot KEY whose
rows must meet matching build rows. Salting can: the probe side gets a
random salt in [0, S); the build side is replicated S times, once per
salt value; the join key becomes (key, salt). One hot key's rows then
land on S different reducers.

Semantics are unchanged — every probe row still meets every matching
build row exactly once — which is why the registered query using this
operator is checked against the plain-join DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the shuffle key salted S ways.

    probe: the large/skewed side — gets one deterministic-per-row salt
    (hash of all columns, stable across retries, unlike rand()).
    build: the smaller side — replicated ``n_salts`` times via one
    explode (its shuffle volume multiplies by S; pick S accordingly).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    p = probe.withColumn("_salt", salt)
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(
        b,
        (p[probe_key] == b[build_key]) & (p["_salt"] == b["_salt"]),
        how,
    )
    return out.drop("_salt")
