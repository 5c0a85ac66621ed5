"""Graph operators for dedup clustering (north-star pipeline need: collapse
near-duplicate *pairs* into duplicate *groups* and elect a canonical doc).

:func:`connected_components` is iterative min-label propagation over
DataFrames — the one place in this engine where a driver-side loop is
legitimate: each iteration is a fully distributed join+aggregate, the loop
only checks a converged flag (count), and iterations are bounded by the
graph diameter (for near-dup clusters, typically < 10). At 100 TB the same
pattern runs with checkpointing every few iterations to truncate lineage
(hook provided).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Label every vertex of the undirected edge set with the minimum
    vertex id reachable from it (its component id).

    Returns (node, component). Deterministic: min-label propagation has a
    unique fixpoint. ``checkpoint_every`` > 0 checkpoints the label frame
    periodically (needed for long chains at scale; off by default for the
    short-diameter dedup graphs)."""
    bidir = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        bidir.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    prev_cached: DataFrame | None = None
    n_changed = 0
    for i in range(max_iterations):
        neighbor_min = (
            bidir.join(labels, bidir.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.col("component")
                    != F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    )
                ).alias("changed"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.checkpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        n_changed = new_labels.filter(F.col("changed")).count()
        # the count above materialized new_labels' cache; the previous
        # iteration's cached frame is no longer referenced — release it so
        # long runs don't accumulate cached partitions
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = new_labels
        labels = new_labels.select("node", "component")
        if n_changed == 0:
            break
    if n_changed != 0:
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({n_changed} labels still changing) — component ids "
            "are NOT final; raise max_iterations (graph diameter exceeds it)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
