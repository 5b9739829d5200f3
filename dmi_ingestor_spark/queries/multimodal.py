"""Multimodal queries (SURVEY.md U2/U8): binary payload plumbing.

``mm_decode_features`` is partially oracle-checkable: sha256 and byte
lengths are engine-agnostic, so the scalar halves get a DuckDB twin;
the Arrow-batch feature vectors are covered by invariant tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.operators.multimodal import (
    attach_payloads,
    decode_features,
    sample_frames,
)
from dmi_ingestor_spark.registry import register


@register(
    "mm_payload_metadata",
    oracle="""
    SELECT
      doc_id,
      'application/octet-stream' AS mime,
      CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      sha256(text) AS checksum
    FROM documents
    """,
    doc=(
        "U8 metadata path: payload length + sha256 checksum computed "
        "JVM-side on the binary column (ASCII text ⇒ byte length = char "
        "length, so DuckDB can check it)."
    ),
    tags=("multimodal",),
)
def mm_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payloads(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "mime",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("checksum"),
    )


@register(
    "mm_decode_features",
    oracle=None,  # Arrow-batched Python decode; invariants in tests
    doc=(
        "U2/U8 decode: mapInPandas over binary payloads → checksum + "
        "8-dim feature vector (codec stubbed, plumbing real)."
    ),
    tags=("multimodal", "rows-only"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payloads(table(spark, sf_dir, "documents"))
    return decode_features(media)


@register(
    "mm_frame_sample",
    oracle=None,
    doc=(
        "U2 explode shape: one payload → 4 frame rows via mapInPandas "
        "(video keyframe-sampling plumbing; slicing stub)."
    ),
    tags=("multimodal", "rows-only"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payloads(table(spark, sf_dir, "documents"))
    return sample_frames(media)
