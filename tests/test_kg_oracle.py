"""End-to-end KG build vs the independent DuckDB SQL mirror of the
reference mapping rules (places.rq / alternateNames.rq / consolidate.rq)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geonames_rdf_spark import oracle, vocab
from geonames_rdf_spark.operators import build, consolidate
from tests.conftest import SF, assert_df_parity


def test_full_kg_parity(spark, duck):
    kg = build.build_kg(spark, SF)
    assert_df_parity(kg, duck.execute(oracle.kg_sql()).df())


def test_unconsolidated_parity(spark, duck):
    kg = build.build_kg(spark, SF, consolidate=False)
    assert_df_parity(kg, duck.execute(oracle.kg_sql(consolidated=False)).df())


def test_posthoc_consolidation_equals_emit_time(spark, duck):
    """The reference's post-hoc EXISTS filters == our emit-time guards."""
    raw = build.build_kg(spark, SF, consolidate=False, include_docs=False,
                         include_alt=False, include_ags=False)
    post = consolidate.consolidate_triples(raw)
    want = duck.execute(
        oracle.kg_sql(consolidated=True, docs=False, alt=False, ags=False)
    ).df()
    assert_df_parity(post, want)


def test_branch_coverage(spark):
    kg = build.build_kg(spark, SF).cache()
    gn = vocab

    def objs(subj_id, pred):
        return {
            r["obj"]
            for r in kg.filter(
                (F.col("subj") == f"{vocab.SWS}{subj_id}/") & (F.col("pred") == pred)
            ).collect()
        }

    # population=0 dropped (consolidate.rq:34-37): k=6 is PCLI-adjacent ADM1? k=6 is ADM1
    assert objs(6, gn.GN_POPULATION) == set()
    # k=110 population present
    assert objs(110, gn.GN_POPULATION) == {"871090"}
    # PCLI country: neighbouringFeatures, no parentCountry (places.rq:97-108, consolidate.rq:18-22)
    assert objs(1, gn.GN_NEIGHBOURING_FEATURES) == {f"{vocab.SWS}1/neighbours.rdf"}
    assert objs(1, gn.GN_PARENT_COUNTRY) == set()
    # ADM1: parentFeature = country, nearbyFeatures dropped (places.rq:177-182, consolidate.rq:25-31)
    assert objs(6, gn.GN_PARENT_FEATURE) == {f"{vocab.SWS}1/"}
    assert objs(6, gn.GN_NEARBY_FEATURES) == set()
    # full admin chain: place 110 -> ADM3 70 (most specific bound parent)
    assert objs(110, gn.GN_PARENT_FEATURE) == {f"{vocab.SWS}70/"}
    # ADM3 feature is its own admin3 match -> self excluded, parent is ADM2
    # k=70: adm3_full == its own lookup code
    assert objs(70, gn.GN_PARENT_ADM3) == set()
    assert objs(70, gn.GN_PARENT_FEATURE) == {f"{vocab.SWS}40/"}
    # alt -9999 dropped (consolidate.rq:40-53): k=33 (%3=0 elev null, %11=0 dem -9999)
    assert objs(33, gn.WGS84_ALT) == set()
    # slugify (places.rq:86-87): k=112 asciiname 'Gross Ort 112, Alpha'
    assert objs(112, gn.GN_LOCATION_MAP) == {
        "https://www.geonames.org/112/gross-ort-112-alpha.html"
    }
    kg.unpersist()


def test_ntriples_render(spark):
    from geonames_rdf_spark.functions.terms import nt_term

    kg = build.build_kg(spark, SF, include_docs=False, include_ags=False)
    nts = kg.select(
        F.concat_ws(
            " ",
            F.concat(F.lit("<"), F.col("subj"), F.lit(">")),
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            nt_term(F.col("obj"), F.col("obj_is_iri"), F.col("obj_lang"), F.col("obj_dt")),
            F.lit("."),
        ).alias("nt")
    )
    sample = {r["nt"] for r in nts.collect()}
    assert (
        f"<{vocab.SWS}110/> <{vocab.GN_POPULATION}> "
        '"871090"^^<http://www.w3.org/2001/XMLSchema#integer> .' in sample
    )
    assert any('"@de .' in s for s in sample)  # lang-tagged literal
