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


class FixpointNotConverged(RuntimeError):
    """An iterative graph operator exhausted ``max_iter`` with work left.

    Returning the partial state would be SILENTLY WRONG (an incomplete
    closure / split components), so the loops below raise by default;
    pass ``on_max_iter='warn'`` to accept the truncation explicitly."""


def _handle_nonconverged(op: str, max_iter: int, on_max_iter: str) -> None:
    msg = (f"{op}: not converged after max_iter={max_iter} iterations —"
           " the result would be an incomplete fixpoint. Raise max_iter"
           " or pass on_max_iter='warn' to accept truncation.")
    if on_max_iter == "warn":
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=3)
        return
    raise FixpointNotConverged(msg)


def transitive_closure(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 30,
    on_max_iter: str = "raise",
) -> DataFrame:
    """BFS closure: nodes reachable from ``seeds`` following ``edges``.

    ``edges``: (src, dst).  ``seeds``: (node).  Returns (node, depth) with
    minimal depth; seeds have depth 0.  Equivalent of the SPARQL property
    path ``gn:parentFeature*`` (web/queries/hierarchy.rq:10,
    graph_administrative_subdivisions.rq:10) evaluated as an iterative
    self-join — the only scalable formulation in Spark.

    Raises :class:`FixpointNotConverged` if the frontier is still
    non-empty after ``max_iter`` rounds (a deeper-than-expected hierarchy
    must fail loudly, not return a silently truncated closure).
    """
    from functools import reduce

    # the edge list is re-joined every iteration — materialize it once
    # instead of re-deriving it from the (possibly expensive) parent plan
    edges = edges.select("src", "dst").cache()
    first = seeds.select("node").distinct().withColumn("depth", F.lit(0))
    first = first.localCheckpoint(eager=True)
    # the visited set is kept as a LIST of per-level checkpointed
    # frontiers and unioned lazily: the anti-join scans the same rows
    # either way, but this saves one eager checkpoint JOB per iteration
    # (at small frontiers the per-job overhead dominates the level cost)
    visited = [first]
    frontier = first
    converged = False
    for _ in range(max_iter):
        result = reduce(DataFrame.unionByName, visited)
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("depth") + 1).alias("depth"))
            .join(result, "node", "left_anti")
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            converged = True
            break
        visited.append(nxt)
        frontier = nxt
    result = reduce(DataFrame.unionByName, visited)
    if not converged:
        # one last probe: the final frontier may have emptied exactly on
        # the last allowed round (loop ended before the empty-check ran)
        probe = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .join(result, "node", "left_anti")
        )
        converged = probe.isEmpty()
    edges.unpersist()
    if not converged:
        _handle_nonconverged("transitive_closure", max_iter, on_max_iter)
    return result


def parent_edges(triples: DataFrame, pred: str) -> DataFrame:
    """(src=subj, dst=obj) edge list for one predicate."""
    return triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )


def connected_components(edges: DataFrame, max_iter: int = 50,
                         on_max_iter: str = "raise") -> DataFrame:
    """Hash-min connected components over undirected (a, b) edges, with
    POINTER DOUBLING so rounds scale as O(log diameter), not O(diameter).

    Returns (node, component) with component = min node id in the cluster.
    Each round does two shuffles: (1) hash-min — every node takes the min
    label over itself and its neighbours; (2) pointer jump — every node
    re-reads its label's OWN label (``l(v) <- l(l(v))``), so label
    information hops 2^r-ish nodes after r rounds (the Kiveris
    large-star/small-star family's same asymptotic, in two plain joins).
    A 10^6-long sameAs chain converges in ~20 rounds instead of 10^6.
    Checkpointed per round to keep the plan flat.  This is the `sameAs`
    canonicalization kernel (SURVEY.md §4.2) — GraphFrames-free so it
    runs anywhere PySpark does.

    Raises :class:`FixpointNotConverged` when labels are still changing
    after ``max_iter`` rounds — a silently split component would corrupt
    every downstream canonical id.
    """
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        # (1) hash-min: min over own label and neighbours' labels
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
        # (2) pointer jump: follow the label one more hop — component ids
        # are node ids, so the label table doubles as the pointer table
        parent = new_labels.select(F.col("node").alias("component"),
                                   F.col("component").alias("_jump"))
        new_labels = (
            new_labels.join(parent, "component", "left")
            .select("node",
                    F.coalesce("_jump", "component").alias("component"))
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
            converged = True
            break
    if not converged:
        _handle_nonconverged("connected_components", max_iter, on_max_iter)
    return labels
