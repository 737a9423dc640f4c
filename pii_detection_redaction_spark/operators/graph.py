"""Iterative graph operators: connected components via min-label propagation.

Near-dup clusters need transitive closure (A~B, B~C → one keeper for
{A,B,C}); with no GraphFrames jar available this is the classic DataFrame
formulation: every vertex starts labeled with its own id, and each round
takes the min label over itself and its neighbors. Converges in O(component
diameter) rounds — near-dup clusters are dense (most members pair directly
with the keeper), so diameters are tiny in practice.

Scale shape per round: one shuffle for the neighbor-min aggregation and one
for the label join, both keyed by vertex id. ``localCheckpoint`` truncates
the lineage each round so the plan doesn't grow exponentially (the standard
pitfall of iterative DataFrame algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``; component =
    min vertex id reachable. Raises if not converged within ``max_iter``."""
    sym = edges.select(
        F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst")
    ).union(edges.select(F.col(id_col_b).alias("src"), F.col(id_col_a).alias("dst")))
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()

    for _ in range(max_iter):
        msgs = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.withColumnRenamed("label", "old")
            .join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("old"), F.coalesce("nbr_min", F.col("old"))).alias(
                    "label"
                ),
                "old",
            )
        ).localCheckpoint()
        changed = new.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = new.select("id", "label")
        if changed == 0:
            return labels.withColumnRenamed("label", "component")
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
