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

# Prepared-plan memo (optimization r09): the gazetteer derivation and the
# full-KG plan are PURE functions of (session, sf_dir, flags) — lazy
# DataFrames, no data.  Re-deriving them per call re-runs temp-view
# registration, SQL parsing and eager per-transformation ANALYSIS of a
# multi-thousand-node tree on the driver (~0.5 s for the tables, ~2 s for
# the full build plan — measured, OPTIMIZATION_r09.md) while EXECUTION of
# the same plan is what actually scans the parquet.  Memoizing the plan —
# the prepared-statement pattern — removes that fixed driver cost from
# every repeated build in a long-lived session.  NO EXECUTION STATE is
# shared: ``build_kg`` hands every caller a FRESH Dataset over the stored
# analyzed plan (``_fresh_over``), because returning the same Dataset
# object would let Spark silently reuse its shuffle files and broadcast
# futures across actions (stage skipping) — which would turn a repeated,
# timed build into a shuffle replay instead of a recomputation from the
# parquet inputs.  Entries are validated against the owning session and
# keyed by every argument that shapes the plan.
_PLAN_MEMO: dict = {}


def _fresh_over(df: DataFrame) -> DataFrame:
    """A new Dataset over ``df``'s already-analyzed plan: analysis cost is
    amortized (the wrapped tree is fully resolved, so the analyzer's
    fixed point is one cheap pass), while the new QueryExecution gets its
    own physical plan, RDDs, shuffle ids and broadcast futures — every
    action recomputes from the inputs."""
    return df.select("*")


def _memo_session_ok(spark: SparkSession) -> bool:
    try:
        return not spark.sparkContext._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001 — any broken handle means rebuild
        return False


def gazetteer_tables(spark: SparkSession, sf_dir: str,
                     replicate: int = 1,
                     cache_dims: bool = True) -> dict[str, DataFrame]:
    """Derive every pre-shaped table from the raw synthesized inputs.

    ``cache_dims`` persists the raw feature table: five consumers read it
    (features_plus, four admin lookups, countries) and the derivation
    chain would otherwise be recomputed per broadcast build.  Dimension
    tables are cache-sized by definition (GeoNames ~13M rows vs 10^12
    pages).

    The derived PLAN dict is memoized per (session, sf_dir, replicate,
    cache_dims) — see ``_PLAN_MEMO``; a shallow copy is returned so
    callers that swap entries (``run_pipeline`` re-binds ``features`` to
    a cached frame) cannot leak into later calls.
    """
    key = ("gaz", sf_dir, replicate, cache_dims)
    hit = _PLAN_MEMO.get(key)
    if hit is not None and hit[0] is spark and _memo_session_ok(spark):
        out = dict(hit[1])
        out["admin_lookups"] = dict(out["admin_lookups"])
        return out
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
    tables = {
        "features": features_bn,
        "alt_names": alt,
        "country_codes": country_codes,
        "admin_lookups": lookups,
        "hierarchy": hierarchy,
        "ags_map": gaz["ags_map"],
    }
    _PLAN_MEMO[key] = (spark, tables)
    return {**tables, "admin_lookups": dict(lookups)}


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
    pay it twice).

    The assembled PLAN is memoized per (session, sf_dir, flags) when
    ``tables`` is None — see ``_PLAN_MEMO``: the returned DataFrame is an
    immutable lazy plan, and re-assembling it costs ~2 s of driver-side
    analysis per call; execution always recomputes from the parquet."""
    memo_key = None
    if tables is not None:
        if replicate != 1:
            raise ValueError("replicate requires deriving fresh tables")
        t = tables
    else:
        memo_key = ("kg", sf_dir, consolidate, include_docs, include_alt,
                    include_ags, include_ontology, ags_country, replicate)
        hit = _PLAN_MEMO.get(memo_key)
        if hit is not None and hit[0] is spark and _memo_session_ok(spark):
            return _fresh_over(hit[1])
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
    if memo_key is not None:
        _PLAN_MEMO[memo_key] = (spark, out)
        # the stored Dataset is the PLAN holder only — hand out a fresh
        # wrapper so no caller's execution state is pinned by the memo
        return _fresh_over(out)
    return out
