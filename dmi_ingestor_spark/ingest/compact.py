"""Small-file compaction for partitioned parquet tables (S-maintenance).

The reference writes one object per band/timestep forever
(``dmi_ingestor/ingestor.py:101-131``) and accumulates small files; a
100 TB table ingested in micro-batches does the same and dies by
metadata: a million 1 MB files make scan planning, not IO, the
bottleneck. Compaction is the standard maintenance operator every
table format ships (OPTIMIZE): rewrite each partition's many small
files into few right-sized ones, preserving content.

Spark-first shape: one pass — read, repartition so each output task
holds one partition-directory's rows (``repartition(part_cols)``
hash-clusters rows of a partition into the same task), write to a
staging directory, then swap per PARTITION directory through the
Hadoop ``FileSystem`` API (same code path for file://, hdfs://,
s3a:// — cf. ingest/fs.py). Spark refuses to overwrite a path it is
reading (self-overwrite analysis check), and the staging+swap is what
a real OPTIMIZE does anyway: readers keep seeing the old files until
the per-directory rename, so each partition flips atomically. No
driver-side loops over data — only over partition DIRECTORY names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dmi_ingestor_spark.ingest.fs import (
    _fs_and_path,
    fs_delete,
    fs_exists,
    fs_list_subdirs,
)


def compact_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Rewrite a partitioned parquet table with ``files_per_partition``
    files per partition directory (content-preserving).

    ``files_per_partition > 1`` adds a deterministic salt to the
    clustering key so one oversized partition can still split across
    several writers — the knob for partitions larger than one task
    should write. Single-level partitioning is assumed for the swap.
    """
    from pyspark.sql import functions as F

    assert len(partition_cols) == 1, "single-level partitioning supported"
    staging = path.rstrip("/") + ".compacting"

    df = spark.read.parquet(path)
    if files_per_partition <= 1:
        clustered = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        salt = (
            F.abs(F.hash(*df.columns)) % files_per_partition
        ).alias("__salt")
        clustered = (
            df.withColumn("__salt", salt)
            .repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
            .drop("__salt")
        )
    clustered.write.mode("overwrite").partitionBy(*partition_cols).parquet(
        staging
    )

    # per-partition-directory atomic swap: delete old dir, move new in
    fs, _ = _fs_and_path(spark, path)
    for part in fs_list_subdirs(spark, staging):
        old = f"{path}/{part}"
        new = f"{staging}/{part}"
        if fs_exists(spark, old):
            fs_delete(spark, old)
        _, jold = _fs_and_path(spark, old)
        _, jnew = _fs_and_path(spark, new)
        fs.rename(jnew, jold)
    fs_delete(spark, staging)


def data_file_counts(spark: SparkSession, path: str) -> dict[str, int]:
    """parquet data-file count per partition directory (test helper)."""
    import os

    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            out[os.path.relpath(root, path)] = n
    return out
