"""End-to-end KG build orchestration over the synthesized gazetteer.

Wires the pre-shaping operators into the two triple-mapping melts — the
Spark equivalent of the reference's download -> transform -> merge stages
(`run.sh:33-63`), as ONE lazy logical plan instead of 20 shell steps, so
Catalyst prunes/pushes across stage boundaries the reference couldn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geonames_rdf_spark import synth
from geonames_rdf_spark.operators import altnames, places, preshape


def gazetteer_tables(spark: SparkSession, sf_dir: str,
                     replicate: int = 1,
                     cache_dims: bool = True) -> dict[str, DataFrame]:
    """Derive every pre-shaped table from the raw synthesized inputs.

    ``cache_dims`` persists the raw feature table: five consumers read it
    (features_plus, four admin lookups, countries) and the derivation
    chain would otherwise be recomputed per broadcast build.  Dimension
    tables are cache-sized by definition (GeoNames ~13M rows vs 10^12
    pages).
    """
    gaz = synth.register_gazetteer(spark, sf_dir, replicate=replicate)
    if cache_dims:
        raw = gaz["features"].cache()
        raw.createOrReplaceTempView("features")
        gaz["features"] = raw
        gaz["features_plus"] = spark.sql(synth.TABLE_SQL["features_plus"])
    features = gaz["features_plus"]
    alt = preshape.semi_join_alt_names(gaz["alt_names"], features)
    best = preshape.best_names(alt)
    features_bn = preshape.with_best_name(features, best)
    country_codes = preshape.derive_country_codes(gaz["features"])
    lookups = {lvl: preshape.derive_admin_lookup(gaz["features"], lvl) for lvl in (1, 2, 3, 4)}
    hierarchy = preshape.filter_country_hierarchy(gaz["hierarchy_raw"], country_codes)
    return {
        "features": features_bn,
        "alt_names": alt,
        "country_codes": country_codes,
        "admin_lookups": lookups,
        "hierarchy": hierarchy,
        "ags_map": gaz["ags_map"],
    }


def gazetteer_tables_from_raw(spark: SparkSession,
                              raw: dict[str, DataFrame]) -> dict:
    """Derive the pre-shaped tables from a RAW gazetteer dict
    (``features``, ``alt_names``, ``hierarchy_raw``, ``ags_map``) —
    the hook for building a MUTATED dump world (delta/scoped-changelog
    fixtures) without touching the session temp views.

    The adm1/adm2 derivation mirrors ``synth.FEATURES_PLUS_SQL``
    (download.sh:87); drift between the two renderings is caught by the
    ``kg_scoped_changelog`` oracle row, which replays this whole chain
    in DuckDB."""
    features_raw = raw["features"]
    features_plus = features_raw.selectExpr(
        "*",
        "country_code || '.' || admin1_code AS adm1",
        "CASE WHEN admin2_code <> '' THEN country_code || '.' ||"
        " admin1_code || '.' || admin2_code ELSE 'NONE' END AS adm2")
    alt = preshape.semi_join_alt_names(raw["alt_names"], features_plus)
    best = preshape.best_names(alt)
    features_bn = preshape.with_best_name(features_plus, best)
    country_codes = preshape.derive_country_codes(features_raw)
    lookups = {lvl: preshape.derive_admin_lookup(features_raw, lvl)
               for lvl in (1, 2, 3, 4)}
    hierarchy = preshape.filter_country_hierarchy(raw["hierarchy_raw"],
                                                  country_codes)
    return {
        "features": features_bn,
        "alt_names": alt,
        "country_codes": country_codes,
        "admin_lookups": lookups,
        "hierarchy": hierarchy,
        "ags_map": raw["ags_map"],
    }


def feature_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = gazetteer_tables(spark, sf_dir)
    return places.feature_entities(
        t["features"], t["country_codes"], t["admin_lookups"], t["hierarchy"]
    )


def build_kg(
    spark: SparkSession,
    sf_dir: str,
    consolidate: bool = True,
    include_docs: bool = True,
    include_alt: bool = True,
    include_ags: bool = True,
    include_ontology: bool = True,
    ags_country: str = "C0",
    replicate: int = 1,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Full triple table: features ∪ documents ∪ alternate names ∪ AGS
    ∪ static ontology/property-definition block (the reference merges the
    ontology and property-definitions.ttl into its final output —
    consolidate.rq:60-64, docker-compose.yml:33-35).

    ``tables``: pre-built ``gazetteer_tables`` output — pass it when the
    caller already derived (and cached) the gazetteer so the whole
    pre-shaping chain isn't re-derived per consumer (run_pipeline used to
    pay it twice)."""
    if tables is not None:
        if replicate != 1:
            raise ValueError("replicate requires deriving fresh tables")
        t = tables
    else:
        t = gazetteer_tables(spark, sf_dir, replicate=replicate)
    wide = places.feature_entities(
        t["features"], t["country_codes"], t["admin_lookups"], t["hierarchy"]
    )
    out = places.melt_feature_triples(
        wide, consolidate=consolidate, include_docs=include_docs
    )
    if include_alt:
        out = out.unionByName(altnames.alt_name_triples(t["alt_names"]))
    if include_ags:
        ags = preshape.ags_lookup(t["features"], t["ags_map"], country=ags_country)
        out = out.unionByName(altnames.ags_triples(ags))
    if include_ontology:
        from geonames_rdf_spark.sources import ontology

        out = out.unionByName(ontology.ontology_triples(spark))
    return out
