"""Distributed connected components — the dedup-cluster primitive.

Near-dup detection (MinHash / SimHash banding) emits PAIRS; turning pairs
into deletion decisions needs the transitive closure: if A~B and B~C, all
three are one cluster and one representative survives. That closure is
connected components over the pair graph.

The reference engine has no graph surface (its world is single-Store
predicate scans, `/root/reference/src/lib.rs`); this module is part of the
LLM-pipeline extension surface mandated by the driver.

Algorithm: min-label propagation with pointer jumping.

* Every node starts labeled with itself.
* Round = (1) neighbor-min: each node takes the min label over itself and
  its neighbors — one shuffle join (edges ⋈ labels on the dst key) plus
  one groupBy-min on the node key; (2) pointer jump: label := label(label)
  — one more self-join — which halves remaining chain depth, so rounds
  needed are O(log diameter) instead of O(diameter). Near-dup graphs are
  dense blobs with tiny diameter, so this converges in a handful of
  rounds even at 100 TB; a pathological 1M-node path graph still needs
  only ~20 rounds.
* Each round ends in an eager localCheckpoint(): iterative self-joins
  otherwise double the logical plan every pass until the optimizer chokes.
  On a multi-executor cluster prefer a reliable checkpoint dir
  (sc.setCheckpointDir + .checkpoint()) so a lost executor cannot lose
  label partitions; localCheckpoint is the local-mode equivalent.
* The convergence probe is a count() of changed labels — one integer per
  round crosses the driver, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    out_node: str = "node",
    out_comp: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges`` (either
    endpoint); ``component`` is the minimum node id in the node's connected
    component, so it doubles as the canonical cluster representative.

    Edges are treated as undirected; isolated nodes (not in any edge) do
    not appear — callers union them back as their own singletons.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.localCheckpoint(eager=True)  # computed once, joined every round

    labels = (
        e.select(F.col("s").alias("node"))
        .distinct()
        .select(F.col("node"), F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = e.join(
            labels.select(F.col("node").alias("d"), F.col("lbl")), "d"
        ).select(F.col("s").alias("node"), F.col("lbl"))
        cand = (
            labels.select("node", "lbl")
            .union(nbr_min)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        jump = cand.select(F.col("node").alias("lbl"), F.col("lbl").alias("jlbl"))
        new = cand.join(jump, "lbl", "left").select(
            "node", F.coalesce("jlbl", "lbl").alias("lbl")
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.select("node", F.col("lbl").alias("new_lbl"))
            .join(labels, "node")
            .where(F.col("new_lbl") != F.col("lbl"))
            .count()
        )
        labels = new
        if changed == 0:
            break

    return labels.select(F.col("node").alias(out_node), F.col("lbl").alias(out_comp))
