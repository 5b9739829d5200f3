"""Real object-store integration (SURVEY.md S6) — skipped in sandbox.

The reference uploads its outputs to S3 (``dmi_ingestor/ingestor.py:125-
131``); this repo routes every write through Hadoop's ``FileSystem`` API
so ``s3a://`` takes the same code path as ``file://`` — but the sandbox
has no credentials or network, so the proof must run on a real cluster.
Set ``DMI_S3_TEST_URI=s3a://bucket/prefix`` (with hadoop-aws on the
classpath and AWS credentials in the environment) to activate; see
``docs/S3_RUNBOOK.md`` for the full recipe.
"""

from __future__ import annotations

import os
import uuid

import pytest

S3_URI = os.environ.get("DMI_S3_TEST_URI", "").rstrip("/")

pytestmark = pytest.mark.skipif(
    not S3_URI.startswith("s3a://"),
    reason="DMI_S3_TEST_URI not set to an s3a:// prefix (sandbox has no "
    "object store; see docs/S3_RUNBOOK.md)",
)


@pytest.fixture()
def s3_prefix() -> str:
    return f"{S3_URI}/it-{uuid.uuid4().hex[:12]}"


def test_write_audit_publish_on_s3(spark, sf_dir, s3_prefix):
    from dmi_ingestor_spark.ingest.fs import (
        fs_delete,
        fs_exists,
        fs_publish_exclusive,
    )

    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    staging = f"{s3_prefix}/_staging/unit-0"
    final = f"{s3_prefix}/published/unit-0"
    df.write.mode("overwrite").parquet(staging)
    assert fs_publish_exclusive(spark, staging, final)
    assert fs_exists(spark, final)
    # second publish to the same destination must fail atomically
    df.write.mode("overwrite").parquet(staging)
    assert not fs_publish_exclusive(spark, staging, final)
    assert spark.read.parquet(final).count() == df.count()
    fs_delete(spark, s3_prefix)


def test_txlog_commit_and_time_travel_on_s3(spark, sf_dir, s3_prefix):
    from dmi_ingestor_spark.ingest.fs import fs_delete
    from dmi_ingestor_spark.ingest.txlog import TxLog

    tx = TxLog(spark, f"{s3_prefix}/txlog")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").limit(5)
    v1 = tx.append(r.select(r.columns[0]), "regions")
    v2 = tx.append(n.select(n.columns[0]), "nations")
    assert tx.read(v1).count() == r.count()
    assert tx.read(v2).count() == r.count() + 5
    # retention: drop the first unit, prior snapshot still reads it
    tx.remove_units(["regions"])
    assert tx.read().count() == 5
    assert tx.read(v2).count() == r.count() + 5  # time travel
    fs_delete(spark, s3_prefix)
