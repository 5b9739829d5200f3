"""Connected components over a pair graph (dedup clustering).

Near-dup detection (``queries/dedup.py``) emits PAIRS; a pipeline that
drops duplicates needs CLUSTERS — the transitive closure of the pair
graph, each doc labeled with its component (min doc_id by convention).

Algorithm: iterative min-label propagation. Each round every node takes
the minimum label among itself and its neighbors; converges in
O(component diameter) rounds. Dedup graphs are near-clique bundles
(diameter ≤ ~3), so this beats the O(log n) large-star/small-star
machinery in both rounds and code; swap in star-contraction if a
workload ever produces long chains.

Scale notes: each round is one shuffle (groupBy node) over the EDGE set
— never the corpus. Labels are cached and the old round unpersisted;
for very deep graphs add ``localCheckpoint()`` every ~5 rounds to cut
lineage. Convergence is a driver-side count of changed labels (a
scalar, not a collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable. Edges are treated as undirected.

    ``checkpoint_every=k`` localCheckpoints the label relation every k
    rounds — required when the graph's diameter (= rounds to converge)
    is more than a handful, else the per-round lineage chain makes the
    logical plan grow multiplicatively (AQE's plan stringification alone
    can OOM the driver). Semantically transparent; pure lineage
    truncation."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    labels.count()
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nb_min"))
        )
        cand = labels.join(
            neighbor_min, labels.node == neighbor_min.u, "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nb_min"), F.col("component"))
            ).alias("component"),
        )
        # Shortcut (pointer doubling): follow the label one more hop
        # through the candidate labeling itself — label(v) is a node
        # reachable from v, so label(label(v)) is too, and composing
        # halves the remaining distance to the component minimum every
        # round: O(log diameter) rounds instead of O(diameter).
        lk = cand.select(
            F.col("node").alias("lk_node"), F.col("component").alias("lk_comp")
        )
        new_labels = (
            cand.join(lk, cand.component == F.col("lk_node"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("lk_comp"), F.col("component")),
                ).alias("component"),
            )
            .cache()
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
