"""Query modules. Importing this package populates the registry."""

from dmi_ingestor_spark.queries import (  # noqa: F401
    aggregates,
    dedup,
    ingestion,
    joins,
    multimodal,
    relational,
    reshape,
    scalars,
    setops,
    similarity,
    streaming,
    textops,
    tpch,
    udaf,
    windows,
)
