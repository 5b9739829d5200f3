"""dmi_ingestor_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ingestion job (``directedproject-eu/dmi-ingestor``,
``dmi_ingestor/ingestor.py:1-233``) extended with the relational and
LLM-data-pipeline operator surface documented in ``SURVEY.md §2``.

Design tenets (SURVEY.md §1.3, §4.2):

* DataFrame/SQL only — every operator is a Catalyst logical plan, so
  predicate pushdown, column pruning, join selection, AQE and
  whole-stage codegen come for free.
* Long-form relational data model for the reference's datacube.
* Pandas UDFs (Arrow-vectorized) only where Catalyst has no
  equivalent (reprojection, NetCDF decode, multimodal decode).
* Every query ships with a DuckDB oracle twin for correctness.
"""

__version__ = "0.1.0"

from dmi_ingestor_spark.registry import REGISTRY, QuerySpec, register  # noqa: F401
