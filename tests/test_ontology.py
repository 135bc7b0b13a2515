"""Static ontology/property-definition block (consolidate.rq:55-64,
property-definitions.ttl:7-8, docker-compose.yml:33-35 merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geonames_rdf_spark import vocab
from geonames_rdf_spark.operators import build
from geonames_rdf_spark.plans import workload
from geonames_rdf_spark.sources import ontology
from tests.conftest import SF


def test_property_definition_block_reaches_kg(spark):
    kg = build.build_kg(spark, SF).filter(F.col("subj") == vocab.WDT_P439)
    rows = {(r["pred"], r["obj"], r["obj_lang"]) for r in kg.collect()}
    assert (vocab.RDF_TYPE, ontology.OWL_DATATYPE_PROPERTY, None) in rows
    assert (ontology.SKOS_PREF_LABEL, "German municipality key", "en") in rows
    assert (ontology.SKOS_PREF_LABEL, "Amtlicher Gemeindeschlüssel", "de") in rows


def test_concept_blocks_reach_kg(spark):
    kg = build.build_kg(spark, SF)
    mus = kg.filter(F.col("subj") == vocab.GN + "S.MUS").collect()
    preds = {(r["pred"], r["obj"]) for r in mus}
    assert (vocab.RDF_TYPE, ontology.SKOS_CONCEPT_TYPE) in preds
    assert (ontology.SKOS_NOTATION, "S.MUS") in preds
    assert (ontology.SKOS_IN_SCHEME, vocab.GN + "S") in preds
    assert (ontology.SKOS_PREF_LABEL, "museum") in preds
    # opt-out flag removes the whole static block
    none = build.build_kg(spark, SF, include_ontology=False).filter(
        F.col("subj").startswith(vocab.GN) | (F.col("subj") == vocab.WDT_P439)
    )
    assert none.count() == 0


def test_c12_joins_against_in_kg_concepts(spark):
    kg = build.build_kg(spark, SF)
    out = workload.q_code_labels_in_kg(kg)
    got = {(r["code_iri"], r["label"]) for r in out.collect()}
    assert (vocab.GN + "S.MUS", "museum") in got
    assert (vocab.GN + "A.ADM1", "first-order administrative division") in got
    # every emitted label pair comes from the checked-in concept table
    assert got <= set(ontology.concept_labels())


def test_oracle_values_sql_mirrors_rows():
    import duckdb

    rows = ontology.ontology_triple_rows()
    got = duckdb.connect().execute(ontology.oracle_values_sql()).fetchall()
    norm = [tuple(r) for r in got]
    assert norm == [tuple(r) for r in rows]
