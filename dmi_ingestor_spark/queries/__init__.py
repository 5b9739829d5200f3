"""Query modules. Importing this package populates the registry."""

from dmi_ingestor_spark.queries import relational  # noqa: F401
