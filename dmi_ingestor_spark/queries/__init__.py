"""Query modules. Importing this package populates the registry."""

from dmi_ingestor_spark.queries import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    multimodal,
    relational,
    scalars,
    setops,
    similarity,
    textops,
    windows,
)
