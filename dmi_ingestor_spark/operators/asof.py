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
    # Group by left_id ALONE — it is the contract's uniqueness key, so the
    # other left columns are constant within a group and ride through
    # any_value (no orderability requirement on their types). A narrow
    # grouping key also means a narrow shuffle key at scale, vs hashing
    # every left column. Grouping by all left columns (the old form)
    # would additionally merge rows that collide on every column.
    other_left = [c for c in left.columns if c != left_id]
    best = F.max(F.struct(*struct_cols)).alias("_b")
    carried = [F.any_value(F.col(c)).alias(c) for c in other_left]
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_b.{right_time}").alias(right_time)]
    out_cols += [F.col(f"_b.{right_tiebreak}").alias(right_tiebreak)]
    out_cols += [F.col(f"_b.{c}").alias(c) for c in payload]
    return joined.groupBy(F.col(left_id)).agg(best, *carried).select(*out_cols)


def asof_join_next(
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
    """Forward as-of: the EARLIEST right row strictly after the left
    time (ties broken by min tiebreak) — the look-ahead twin of
    :func:`asof_join_latest` (next forecast after an observation, next
    order after a touchpoint). Same map-side-combining min(struct)
    design; inner semantics.
    """
    payload = payload or []
    joined = left.join(
        right,
        (left[left_key] == right[right_key])
        & (right[right_time] > left[left_time]),
    )
    struct_cols: list[Column] = [F.col(right_time), F.col(right_tiebreak)]
    struct_cols += [F.col(c) for c in payload]
    other_left = [c for c in left.columns if c != left_id]
    best = F.min(F.struct(*struct_cols)).alias("_b")
    carried = [F.any_value(F.col(c)).alias(c) for c in other_left]
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_b.{right_time}").alias(right_time)]
    out_cols += [F.col(f"_b.{right_tiebreak}").alias(right_tiebreak)]
    out_cols += [F.col(f"_b.{c}").alias(c) for c in payload]
    return joined.groupBy(F.col(left_id)).agg(best, *carried).select(*out_cols)


def asof_join_nearest(
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
    """Nearest-neighbor as-of: the right row minimizing
    ``|right_time - left_time|`` per left row (ties: the EARLIER right
    time wins, then min tiebreak) — the symmetric direction pandas'
    ``merge_asof(direction="nearest")`` offers alongside backward/
    forward. Same map-side-combining min(struct) design as the other
    two: the per-key blowup (all matching right rows) partial-combines
    to one row per left row before the shuffle; inner semantics.
    """
    payload = payload or []
    joined = left.join(right, left[left_key] == right[right_key])
    absdiff = F.abs(
        F.unix_micros(F.col(right_time).cast("timestamp"))
        - F.unix_micros(F.col(left_time).cast("timestamp"))
    )
    struct_cols: list[Column] = [
        absdiff.alias("_ad"),
        F.col(right_time),
        F.col(right_tiebreak),
    ]
    struct_cols += [F.col(c) for c in payload]
    other_left = [c for c in left.columns if c != left_id]
    best = F.min(F.struct(*struct_cols)).alias("_b")
    carried = [F.any_value(F.col(c)).alias(c) for c in other_left]
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_b.{right_time}").alias(right_time)]
    out_cols += [F.col(f"_b.{right_tiebreak}").alias(right_tiebreak)]
    out_cols += [F.col(f"_b.{c}").alias(c) for c in payload]
    return joined.groupBy(F.col(left_id)).agg(best, *carried).select(*out_cols)
