"""Pipeline assembly + N-Triples materialization (stages S6-S7).

``run_pipeline`` wires extract -> mention-detect -> link -> canonicalize
-> materialize into one lazy plan.  Output triples = the gazetteer feature
triples (places/altnames mappings — the reference-parity set) UNION page
mention edges ``?page gn:locatedIn ?feature`` with provenance, partitioned
by url-hash buckets for the lineage/resume layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geonames_rdf_spark import vocab
from geonames_rdf_spark.functions.terms import feature_uri, nt_term
from geonames_rdf_spark.operators import build
from geonames_rdf_spark.pipeline import corpus, extract, link, mentions

GN_LOCATED_IN = vocab.GN + "locatedIn"
N_BUCKETS = 32


def with_bucket(pages: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """url-hash partitioning key (north_rule: partitioned by url-hash)."""
    return pages.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)))


def mention_triples(linked: DataFrame) -> DataFrame:
    """(page url) gn:locatedIn (feature uri) — deduplicated per page."""
    return (
        linked.select(
            F.col("url").alias("subj"),
            F.lit(GN_LOCATED_IN).alias("pred"),
            feature_uri(F.col("geonameid")).alias("obj"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
        .withColumn("obj_is_iri", F.lit(True))
        .withColumn("obj_lang", F.lit(None).cast("string"))
        .withColumn("obj_dt", F.lit(None).cast("string"))
    )


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    n_pages: int = 1000,
    include_feature_triples: bool = True,
    cache: bool = True,
    canonicalize_entities: bool = False,
) -> dict[str, DataFrame]:
    """Full web-scale KG construction over a synthesized corpus.

    ``cache=True`` persists the dimension-sized feature table and the page
    corpus: both feed multiple consumers (two driver collects + the link
    join; mention scan + the lang join).  On a real deployment the corpus
    is a storage table — the re-read is pruned columnar IO — but a
    generated corpus would otherwise be re-synthesized per consumer.
    """
    tables = build.gazetteer_tables(spark, sf_dir)
    features = tables["features"]
    if cache:
        features = features.cache()

    surfaces = corpus.gazetteer_surfaces(features)
    pages = corpus.synthesize_pages(spark, surfaces, n_pages)
    # S1: recompute text from html (byte-identity invariant)
    pages = extract.with_extracted_text(pages.drop("text").withColumn(
        "text", F.lit(None).cast("string")))
    if cache:
        pages = pages.cache()
    # S3+S4 fused: broadcast Aho-Corasick with scored candidates; mention
    # detection, scoring and per-mention argmax all inside the Arrow batch
    # (candidate fan-out never shuffles).  The staged operators
    # (detect_mentions + link_mentions) remain available for scoring
    # features that cannot be broadcast; equivalence is test-pinned.
    smap_scored = mentions.build_scored_surface_map(features)
    linked = mentions.detect_and_link(pages, smap_scored)
    # candidate-level mention stream via the staged operator — lazy; only
    # evaluated when a caller actually consumes it
    ment = mentions.detect_mentions(
        pages, mentions.build_surface_map(features), carry_lang=True
    )
    # S5 (optional): sameAs clustering -> canonical-id rewrite of links
    if canonicalize_entities:
        from geonames_rdf_spark.pipeline import canonicalize

        edges = canonicalize.sameas_edges(features)
        mapping = canonicalize.canonical_map(edges)
        linked = canonicalize.rewrite_links(linked, mapping)
    # S6: triples
    mt = mention_triples(linked)
    out = mt
    if include_feature_triples:
        out = build.build_kg(spark, sf_dir).unionByName(mt)
    # S2 used `features` for surfaces/map/link; mark it reusable for callers
    tables["features"] = features
    return {
        "pages": pages,
        "mentions": ment,
        "linked": linked,
        "triples": out,
    }


def to_ntriples(triples: DataFrame) -> DataFrame:
    """Render canonical N-Triples lines (the text sink format, A6/A8)."""
    return triples.select(
        F.concat_ws(
            " ",
            F.concat(F.lit("<"), F.col("subj"), F.lit(">")),
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            nt_term(F.col("obj"), F.col("obj_is_iri"),
                    F.col("obj_lang"), F.col("obj_dt")),
            F.lit("."),
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    to_ntriples(triples).write.mode(mode).text(path)
