"""Central query registry.

Every operator from SURVEY.md §2 lands here as a named :class:`QuerySpec`:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are ANSI-SQL-expressible) a DuckDB oracle SQL twin. ``__spark_entry__.py``
exposes the registry to the driver harness.

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so builders alias every computed column and the oracle SQL
uses the exact same aliases.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def _wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return _wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: populates REGISTRY)."""
    import dmi_ingestor_spark.queries  # noqa: F401

    return REGISTRY
