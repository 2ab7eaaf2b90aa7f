"""Duplicate-cluster resolution: near-dup PAIRS → connected-component
GROUPS (the deliverable a dedup pipeline actually acts on: keep one
representative per component).

Algorithm: iterative min-label propagation (a DataFrame-native
union-find). Every node starts labeled with its own id; each round
every node adopts the minimum label in its neighborhood; converged
when no label changes. Rounds needed = graph diameter — near-dup
graphs are almost all tiny cliques (diameter ≤ 2-3), so this
terminates in a handful of shuffles even at corpus scale. Each round
is one groupBy — no driver-side graph state, nothing collected.

This is the standard large-scale CC shape (Hash-to-Min, Vassilvitskii
et al.); GraphFrames does the same thing with more machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) from an undirected edge list; component =
    min node id reachable. Converges in O(diameter) rounds.

    Every round ends with ``localCheckpoint(eager=True)``: each
    iteration references the previous labels twice (neighbor join +
    union), so without lineage truncation the lazy plan DOUBLES per
    round and a diameter-14 graph OOMs the driver during plan
    optimization before any data moves. Checkpointing pins the round's
    result and restarts the plan — state stays two small (node, label)
    tables regardless of round count. (On a production cluster with
    driver-failure recovery requirements, use ``checkpoint()`` with a
    reliable checkpoint dir instead.)
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component")).localCheckpoint(
        eager=True
    )

    for _ in range(max_iterations):
        # candidate label per node: min over (own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Cluster summary from near-dup pairs: one row per duplicate
    component — (component, size, keep_id). keep_id = min id
    (the canonical survivor)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("size"),
        F.min("node").alias("keep_id"),
    )
