"""Filesystem abstraction for retention deletes (SURVEY.md S6/S7).

The reference deletes stale forecasts directly on the object store
(``dmi_ingestor/ingestor.py:67-73``: ``s3.rm(..., recursive=True)``).
Here the same operation goes through Hadoop's ``FileSystem`` API via the
JVM gateway, so the retention path is identical code for ``file://``,
``hdfs://`` and ``s3a://`` URIs — not a local-FS-only ``shutil`` call.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    """Resolve (FileSystem, Path) for a (possibly schemeless) path."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def fs_list_subdirs(spark: SparkSession, path: str) -> list[str]:
    """Names (not full paths) of immediate child directories, [] if absent."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [
        st.getPath().getName() for st in fs.listStatus(jpath) if st.isDirectory()
    ]


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; True if something was removed."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.delete(jpath, True))


def fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic-per-filesystem rename (the publish step of write-audit-
    publish). True on success; False if src is missing or dst exists."""
    fs, jsrc = _fs_and_path(spark, src)
    _, jdst = _fs_and_path(spark, dst)
    if not fs.exists(jsrc) or fs.exists(jdst):
        return False
    return bool(fs.rename(jsrc, jdst))
