"""Entity canonicalization (stage S5): sameAs clustering + rewrite.

Duplicate-entity detection is an exact hash-groupBy on a normalized key
(salted variants live in operators.skew / operators.dedup); the resulting
sameAs edges feed hash-min connected components (operators.graph), and the
min-geonameid representative rewrites both the linked mentions and the
triple table.  This is the GraphFrames-free formulation of the north
star's 'salted hash-join dedup plus connected-components over sameAs'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geonames_rdf_spark.functions.terms import feature_uri
from geonames_rdf_spark.operators.graph import connected_components


def sameas_edges(features: DataFrame) -> DataFrame:
    """Pairs of geonameids considered the same entity: identical
    (bestName, country_code, lat, long) — exact-dup rule.  Emitted as
    star edges to the min id per group (n-1 edges, not n^2)."""
    key = ["bestName", "country_code", "latitude", "longitude"]
    g = features.select("geonameid", *key).withColumn(
        "rep", F.min("geonameid").over(Window.partitionBy(*key))
    )
    return g.filter(F.col("geonameid") != F.col("rep")).select(
        F.col("rep").alias("a"), F.col("geonameid").alias("b")
    )


def canonical_map(edges: DataFrame) -> DataFrame:
    """(geonameid, canonical) from sameAs edges via connected components."""
    cc = connected_components(
        edges.select(F.col("a").cast("string").alias("a"),
                     F.col("b").cast("string").alias("b"))
    )
    # component label = min node id as string; re-min numerically to be safe
    num = cc.select(
        F.col("node").cast("bigint").alias("geonameid"),
        F.col("component").cast("bigint").alias("component"),
    )
    rep = num.groupBy("component").agg(F.min("geonameid").alias("canonical"))
    return num.join(rep, "component").select("geonameid", "canonical")


def rewrite_links(linked: DataFrame, mapping: DataFrame) -> DataFrame:
    """Replace linked geonameids by their canonical representative."""
    m = F.broadcast(mapping)
    return (
        linked.join(m, "geonameid", "left")
        .withColumn("geonameid", F.coalesce("canonical", "geonameid"))
        .drop("canonical")
    )


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj and IRI objects through the canonical map (URI form)."""
    m = F.broadcast(
        mapping.select(
            feature_uri(F.col("geonameid")).alias("from_uri"),
            feature_uri(F.col("canonical")).alias("to_uri"),
        ).filter(F.col("from_uri") != F.col("to_uri"))
    )
    t = (
        triples.join(m.withColumnRenamed("from_uri", "subj"), "subj", "left")
        .withColumn("subj", F.coalesce("to_uri", "subj"))
        .drop("to_uri")
    )
    t = (
        t.join(
            m.withColumnRenamed("from_uri", "obj").withColumnRenamed("to_uri", "_obj_to"),
            "obj", "left",
        )
        .withColumn(
            "obj",
            F.when(F.col("obj_is_iri") & F.col("_obj_to").isNotNull(), F.col("_obj_to"))
            .otherwise(F.col("obj")),
        )
        .drop("_obj_to")
    )
    return t.dropDuplicates(["subj", "pred", "obj", "obj_lang", "obj_dt"])
