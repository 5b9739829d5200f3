"""Sharded exact global ranking (no SinglePartition sort).

``ROW_NUMBER() OVER (ORDER BY ...)`` / ``NTILE(k) OVER (ORDER BY ...)``
without a partition clause funnel the entire relation through ONE task —
the classic scale cliff. This operator computes the identical ranks with
the shuffle pattern a 1000-executor cluster wants:

1. ``repartitionByRange`` on the sort key — partitions are key-disjoint
   and ordered by partition id (one parallel range shuffle);
2. ``sortWithinPartitions`` — parallel local sorts;
3. a partitions-sized count aggregate (collected: #parts rows, bounded);
4. one Arrow ``mapInPandas`` pass adding the local index (zero extra
   shuffle — the iterator sees each partition's batches in sorted
   order);
5. the broadcast prefix-sum offset turns local index into global rank.

``transform_global_row_number`` (queries/pipeline_ops.py) pioneered the
pattern; this module is the reusable form for every query that needs an
exact global order at scale (equi-frequency histograms, RFM quintiles,
revenue deciles). NTILE's front-loaded fill is then a closed-form
map-side expression over (rank, n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def sharded_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out: str = "rn",
    parts: int = 16,
) -> tuple[DataFrame, int]:
    """Return (df + exact 1-based global rank column ``out``, total rows).

    Ranks follow the total order given by ``order_cols`` (pass ``F.col(
    "x").desc()`` for descending dimensions; include a unique tiebreaker
    for determinism). The plan contains range + hash exchanges only —
    never an Exchange SinglePartition.
    """
    import numpy as np

    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    n_total = acc

    out_schema = StructType(
        [f for f in ranged.schema.fields] + [StructField("_local", LongType())]
    )

    def _add_local(batches):
        base = 0
        for pdf in batches:
            m = len(pdf)
            yield pdf.assign(_local=np.arange(base, base + m, dtype="int64"))
            base += m

    enumerated = ranged.mapInPandas(_add_local, schema=out_schema)
    if offsets:
        off_map = F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
        off = F.coalesce(off_map[F.col("_pid")], F.lit(0))
    else:  # empty input: no partitions observed
        off = F.lit(0)
    result = enumerated.withColumn(
        out, (off + F.col("_local") + 1).cast("long")
    ).drop("_pid", "_local")
    return result, n_total


def ntile_from_rank(rank: Column, n_total: int, k: int) -> Column:
    """NTILE(k)'s front-loaded fill as a closed-form expression over a
    1-based exact rank: the first ``n % k`` buckets take ``ceil(n/k)``
    rows, the rest ``floor(n/k)``. Integer-div is expressed as
    remainder-subtraction so the arithmetic stays in longs under either
    ANSI mode."""
    n_big = n_total % k
    size_small = max(n_total // k, 1)
    size_big = n_total // k + 1
    big_idx = ((rank - 1) - ((rank - 1) % size_big)) / size_big
    rest = rank - 1 - n_big * size_big
    small_idx = (rest - (rest % size_small)) / size_small
    return (
        F.when(rank <= n_big * size_big, big_idx + 1)
        .otherwise(n_big + small_idx + 1)
        .cast("long")
    )
