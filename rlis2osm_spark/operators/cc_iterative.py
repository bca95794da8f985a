"""Iterative connected components via alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
the scale path for dissolve groups too large for a single worker's
union-find (operators/dissolve.py documents the switch point).

Pure DataFrame self-joins; converges in O(log^2 n) rounds independent of
graph diameter (long street chains are exactly the worst case for naive
label propagation). Each round localCheckpoints to cut lineage — the
driver-side loop the north rule anticipates (SURVEY §4.2 #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = _symmetric(e)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Within each u's not-larger neighborhood, connect all to the min."""
    # orient edges so u >= v
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = o.join(mins, "u")
    out = nbrs.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        nbrs.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame):
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("u", "v") % 1000003).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(u long, v long), undirected -> (node, component) with
    component = min node id of the component. Isolated nodes (self-loops
    allowed in input) keep themselves."""
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    e = (
        edges.where(F.col("u") != F.col("v"))
        # column ORDER matters: union() downstream is positional
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"CC did not converge in {max_iter} rounds")

    # after convergence every edge points a node at its component root
    roots = e.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component")
    return nodes.join(roots, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component"))
