"""Connected components for duplicate-cluster formation.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
representative per component). Min-label propagation over DataFrame
joins: every node starts labeled with itself, each iteration takes the
min label across neighbors, fixpoint in O(component diameter)
iterations — dup clusters are shallow (stars/chains of copies), so this
converges in a handful of rounds.

Scale notes: each iteration is one join + one aggregate (shuffle on the
node id). ``localCheckpoint`` truncates the plan every iteration —
without it the lineage doubles per round and Catalyst analysis time
explodes (the classic iterative-algorithm trap on Spark).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """edges: (id_a, id_b) undirected. Returns (doc_id, cluster_id) for
    every node appearing in an edge; cluster_id = min node id in the
    component."""
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
