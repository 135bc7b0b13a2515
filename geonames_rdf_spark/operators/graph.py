"""Graph operators over the triple table (SURVEY.md §2.C4, §4.2-3).

Spark has no recursive query, so transitive closure is an iterative
join-to-fixpoint (BFS frontier) with ``localCheckpoint`` per iteration to
cut lineage — the standard scale pattern: each iteration is one shuffle
bounded by the frontier size, not the full graph.  Connected components
use hash-min label propagation (the GraphFrames-free formulation), used by
the canonicalization stage (sameAs clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """BFS closure: nodes reachable from ``seeds`` following ``edges``.

    ``edges``: (src, dst).  ``seeds``: (node).  Returns (node, depth) with
    minimal depth; seeds have depth 0.  Equivalent of the SPARQL property
    path ``gn:parentFeature*`` (web/queries/hierarchy.rq:10,
    graph_administrative_subdivisions.rq:10) evaluated as an iterative
    self-join — the only scalable formulation in Spark.
    """
    # the edge list is re-joined every iteration — materialize it once
    # instead of re-deriving it from the (possibly expensive) parent plan
    edges = edges.select("src", "dst").cache()
    result = seeds.select("node").distinct().withColumn("depth", F.lit(0))
    result = result.localCheckpoint(eager=True)
    frontier = result
    for _ in range(max_iter):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("depth") + 1).alias("depth"))
            .join(result, "node", "left_anti")
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        result = result.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return result


def parent_edges(triples: DataFrame, pred: str) -> DataFrame:
    """(src=subj, dst=obj) edge list for one predicate."""
    return triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Hash-min connected components over undirected (a, b) edges.

    Returns (node, component) with component = min node id in the cluster.
    Label propagation to fixpoint; every iteration is one groupBy shuffle
    over the (shrinking) set of label changes, checkpointed to keep the
    plan flat.  This is the `sameAs` canonicalization kernel (SURVEY.md
    §4.2) — GraphFrames-free so it runs anywhere PySpark does.
    """
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        # candidate label per node: min over own label and neighbours' labels
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .select(sym.a.alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        still = not changed.isEmpty()
        labels = new_labels
        if not still:
            break
    return labels
