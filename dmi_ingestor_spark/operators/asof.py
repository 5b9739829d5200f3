"""As-of join operator (SURVEY.md §2.3 J5).

Spark has no single as-of primitive; this is the composition the engine
standardizes on: equi-join on the key + range predicate, then a
lexicographic ``max(struct(time, tiebreak, payload...))`` per left row.

Why max(struct) and not row_number(): the aggregate partial-combines
map-side, so the range join's blowup (every qualifying right row per
left row) collapses to one row per left row *before* the shuffle. A
window would shuffle the full blowup and then sort it. Correctness at
partition boundaries is free — the aggregation is keyed by the left
row's id, so no boundary exists to get wrong (property-tested in
``tests/test_asof_property.py`` regardless).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_tiebreak: str,
    left_id: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with matching key
    and ``right_time <= left_time`` (ties broken by max tiebreak).

    Inner semantics: left rows with no qualifying right row are dropped.
    Output: all left columns + ``payload`` columns from the right side
    (default: right_time and the tiebreak).
    """
    payload = payload or []
    joined = left.join(
        right,
        (left[left_key] == right[right_key])
        & (right[right_time] <= left[left_time]),
    )
    struct_cols: list[Column] = [F.col(right_time), F.col(right_tiebreak)]
    struct_cols += [F.col(c) for c in payload]
    group_cols = [F.col(c) for c in left.columns]
    best = F.max(F.struct(*struct_cols)).alias("_b")
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_b.{right_time}").alias(right_time)]
    out_cols += [F.col(f"_b.{right_tiebreak}").alias(right_tiebreak)]
    out_cols += [F.col(f"_b.{c}").alias(c) for c in payload]
    # group by every left column; left_id must be unique per left row
    return joined.groupBy(*group_cols).agg(best).select(*out_cols)
