"""Driver-replica correctness gate at sf0.001 for every registered query.

Mirrors the driver's t2 check (row-count + schema + order-insensitive
exact values) so regressions surface in `pytest` before the round's
verify runs at sf0.01 (SURVEY.md §5.2).
"""

from __future__ import annotations

import pytest

from dmi_ingestor_spark.registry import load_all
from tools.oracle_check import compare, normalize

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only queries: builder must run; invariants live in
        # their dedicated test modules.
        assert sdf is not None
        return
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, normalize(sdf), normalize(ddf))
    assert not problems, f"{name}: {problems}"
