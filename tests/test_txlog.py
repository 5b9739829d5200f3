"""Transaction-log guarantees: atomic commits, optimistic concurrency,
snapshot isolation / time travel, compaction and vacuum
(ingest/txlog.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.ingest.txlog import TxLog, _write_bytes


@pytest.fixture()
def tx(spark, tmp_path):
    return TxLog(spark, str(tmp_path / "tbl"))


def _orders(spark, sf_dir, status):
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == status)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def test_append_and_time_travel(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    o = _orders(spark, sf_dir, "O")
    v0 = tx.append(f, "f-batch")
    v1 = tx.append(o, "o-batch")
    assert (v0, v1) == (0, 1)
    assert tx.read(version=0).count() == f.count()
    assert tx.read(version=1).count() == f.count() + o.count()
    # latest == v1
    assert tx.read().count() == f.count() + o.count()


def test_remove_is_logical_and_time_travel_survives(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    o = _orders(spark, sf_dir, "O")
    tx.append(f, "f-batch")
    tx.append(o, "o-batch")
    v2 = tx.remove_units(["data/f-batch"])
    assert tx.read(version=v2).count() == o.count()
    # the removed unit is still visible at older versions
    assert tx.read(version=0).count() == f.count()


def test_snapshot_isolation_reader_unaffected_by_later_commit(
    spark, sf_dir, tx
):
    f = _orders(spark, sf_dir, "F")
    tx.append(f, "f-batch")
    snap_before = tx.snapshot()
    reader = tx.read(version=snap_before.version)
    n_before = reader.count()
    tx.append(_orders(spark, sf_dir, "O"), "o-batch")
    # the pinned-version read resolves the same files, later commits
    # notwithstanding
    assert tx.read(version=snap_before.version).count() == n_before
    assert tx.read().count() > n_before


def test_crashed_staging_file_is_invisible(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    tx.append(f, "f-batch")
    # simulate a writer that staged a commit but crashed before the
    # rename: the log replay must never see it
    _write_bytes(
        spark,
        f"{tx.stage_path}/crashed-00000001.json",
        b'{"version": 1, "adds": ["data/ghost"], "removes": []}',
    )
    assert tx.latest_version() == 0
    assert tx.read().count() == f.count()


def test_optimistic_concurrency_retries_to_next_version(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    tx.append(f, "f-batch")
    # a rival writer takes version 1 out from under us
    assert tx._try_commit({"adds": [], "removes": []}, 1, tag="rival")
    # our append must detect the lost race and land on version 2
    v = tx.append(_orders(spark, sf_dir, "O"), "o-batch")
    assert v == 2
    assert tx.snapshot().version == 2


def test_compact_preserves_data_and_old_versions(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    o = _orders(spark, sf_dir, "O")
    tx.append(f, "f-batch")
    tx.append(o, "o-batch")
    before = tx.read().agg(F.sum("o_orderkey")).collect()[0][0]
    v = tx.compact("compacted")
    snap = tx.snapshot()
    assert snap.add_units == ("data/compacted",)
    assert tx.read().agg(F.sum("o_orderkey")).collect()[0][0] == before
    # pre-compaction version still resolves the original units
    assert tx.read(version=v - 1).count() == tx.read().count()


def test_vacuum_deletes_only_dead_units(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    o = _orders(spark, sf_dir, "O")
    tx.append(f, "f-batch")
    tx.append(o, "o-batch")
    tx.compact("compacted")
    n = tx.read().count()
    removed = tx.vacuum()
    assert sorted(removed) == ["data/f-batch", "data/o-batch"]
    # latest snapshot unaffected
    assert tx.read().count() == n


def test_empty_table_read_uses_recorded_schema(spark, sf_dir, tx):
    f = _orders(spark, sf_dir, "F")
    tx.append(f, "f-batch")
    tx.remove_units(["data/f-batch"])
    df = tx.read()
    assert df.count() == 0
    assert df.columns == ["o_orderkey", "o_orderstatus", "o_totalprice"]
