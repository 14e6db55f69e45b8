"""Connected components over a pair/edge DataFrame — the clustering step
that turns near-duplicate PAIRS (MinHash-LSH / SimHash / Jaccard output)
into dedup GROUPS with one canonical survivor per group. The reference
pipeline stops at pair emission; every production dedup pipeline needs
this step to actually drop documents, so it is provided as a first-class
operator (additive, beyond SURVEY.md §2).

Scale design (100 TB):
  - min-label propagation: per iteration ONE shuffle-join (labels onto
    edge endpoints) + ONE groupBy(min) — both keyed on node id, so AQE
    coalesces/splits partitions and skew-splits hot nodes.
  - iterations are O(diameter(G)); near-dup graphs are dense clusters
    with tiny diameters (2-4 typical), not long chains, so the loop
    terminates in a handful of rounds even at corpus scale.
  - each iteration ends in ``localCheckpoint`` to CUT LINEAGE — without
    it the plan doubles per round and the driver OOMs on analysis long
    before executors see data. On a real cluster swap in
    ``df.checkpoint()`` against durable storage for fault tolerance.
  - convergence is detected from ``sum(label)``: labels only ever
    decrease (new = min(old, neighbor mins)), so the total is strictly
    decreasing until fixpoint; an unchanged sum means ZERO labels moved.
    One scalar aggregate per round — no driver-side data, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` is undirected pair output (one row per pair, either order).
    Returns (node, component) for every node that appears in an edge;
    isolated nodes are their own singleton components and never enter
    the edge list — callers left-join and ``coalesce(component, id)``.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)  # edges are reused every round

    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    total = labels.agg(F.sum("label")).first()[0]

    for _ in range(max_iter):
        msgs = e.join(labels, e.a == labels.node).select(
            F.col("b").alias("node"), "label"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_total = labels.agg(F.sum("label")).first()[0]
        if new_total == total:
            break
        total = new_total

    return labels.select("node", F.col("label").alias("component"))


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> dedup groups: one row per component with the
    canonical survivor (min id == the component label), member count and
    the canonically-sorted member list (serialized for hashability).
    Output: component, n_members, member_ids."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.concat_ws("|", F.sort_array(F.collect_list("node"))).alias("member_ids"),
    )
