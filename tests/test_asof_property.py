"""Property test for the as-of join composition (SURVEY.md §7 'hard' #2).

Random keyed/timed rows on both sides, compared against a brute-force
Python oracle. Runs on multi-partition DataFrames so any partition-
boundary bug in the composition would surface.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dmi_ingestor_spark.operators.asof import asof_join_latest

KEYS = st.integers(min_value=0, max_value=3)
TIMES = st.integers(min_value=0, max_value=20)

left_rows = st.lists(
    st.tuples(KEYS, TIMES), min_size=1, max_size=12, unique=True
)
right_rows = st.lists(
    st.tuples(KEYS, TIMES, st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=12,
    unique=True,
)


def brute_force(lrows, rrows):
    out = {}
    for lk, lt in lrows:
        cands = [(rt, tie) for rk, rt, tie in rrows if rk == lk and rt <= lt]
        if cands:
            out[(lk, lt)] = max(cands)
    return out


@settings(max_examples=15, deadline=None)
@given(left_rows, right_rows)
def test_asof_matches_brute_force(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, lt long"
    ).repartition(4)
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "rk long, rt long, tie long"
    ).filter("rk is not null").repartition(3)
    got = {
        (r.k, r.lt): (r.rt, r.tie)
        for r in asof_join_latest(
            left, right, "k", "rk", "lt", "rt", "tie", "lid"
        ).collect()
    }
    assert got == brute_force(lrows, rrows)


def brute_force_next(lrows, rrows):
    out = {}
    for lk, lt in lrows:
        cands = [(rt, tie) for rk, rt, tie in rrows if rk == lk and rt > lt]
        if cands:
            out[(lk, lt)] = min(cands)
    return out


@settings(max_examples=15, deadline=None)
@given(left_rows, right_rows)
def test_asof_next_matches_brute_force(spark, lrows, rrows):
    from dmi_ingestor_spark.operators.asof import asof_join_next

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, lt long"
    ).repartition(4)
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "rk long, rt long, tie long"
    ).filter("rk is not null").repartition(3)
    got = {
        (r.k, r.lt): (r.rt, r.tie)
        for r in asof_join_next(
            left, right, "k", "rk", "lt", "rt", "tie", "lid"
        ).collect()
    }
    assert got == brute_force_next(lrows, rrows)
