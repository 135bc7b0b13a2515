"""Static ontology / property-definition triples (source A9-adjacent).

The reference merges two static RDF inputs into its final output:

- ``config/property-definitions.ttl:7-8`` — the wdt:P439 datatype-property
  block, unioned by ``consolidate.rq:60-64``;
- the GeoNames ontology (``output/ontology_v3.3_modified.rdf``), merged in
  ``docker-compose.yml:33-35`` (rapper -> cat with the data N-Triples).

Spark-first equivalent: the ontology concepts our world references are a
checked-in STATIC DIMENSION (the curated ``gn:Code`` skos blocks for the
feature codes the synthetic gazetteer emits, plus their ``gn:Class``
schemes), melted to triples and unioned into ``build_kg``.  The same
constants drive the C12 code-label join (``workload.code_label_table``)
— one concept dimension, two consumers.  English labels/definitions are
verbatim from the public GeoNames ontology v3.3 (data, not code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geonames_rdf_spark import vocab

SKOS_CONCEPT_TYPE = vocab.GN + "Code"
SKOS_NOTATION = vocab.SKOS + "notation"
SKOS_IN_SCHEME = vocab.SKOS + "inScheme"
SKOS_PREF_LABEL = vocab.SKOS + "prefLabel"
SKOS_DEFINITION = vocab.SKOS + "definition"
GN_CLASS_TYPE = vocab.GN + "Class"
RDFS_COMMENT = vocab.RDFS + "comment"
OWL_DATATYPE_PROPERTY = vocab.OWL + "DatatypeProperty"

# (code, scheme, prefLabel@en, definition@en|None) — ontology_v3.3 blocks
# for every feature code the synthetic world emits (synth.py FEATURES_SQL)
CONCEPTS: list[tuple[str, str, str, str | None]] = [
    ("A.PCLI", "A", "independent political entity", None),
    ("A.ADM1", "A", "first-order administrative division",
     "a primary administrative division of a country, such as a state in"
     " the United States"),
    ("A.ADM2", "A", "second-order administrative division",
     "a subdivision of a first-order administrative division"),
    ("A.ADM3", "A", "third-order administrative division",
     "a subdivision of a second-order administrative division"),
    ("A.ADM4", "A", "fourth-order administrative division",
     "a subdivision of a third-order administrative division"),
    ("P.PPL", "P", "populated place",
     "a city, town, village, or other agglomeration of buildings where"
     " people live and work"),
    ("S.MUS", "S", "museum",
     "a building where objects of permanent interest in one or more of"
     " the arts and sciences are preserved and exhibited"),
]

# (scheme, rdfs:comment@en) — gn:Class instances
CLASSES: list[tuple[str, str]] = [
    ("A", "country, state, region ..."),
    ("P", "city, village,..."),
    ("S", "spot, building, farm, ..."),
]

# property-definitions.ttl:7-8
PROPERTY_LABELS: list[tuple[str, str]] = [
    ("de", "Amtlicher Gemeindeschlüssel"),
    ("en", "German municipality key"),
]

_TRIPLE_COLS = ("subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_dt")


def ontology_triple_rows() -> list[tuple]:
    """Static triple rows (same layout as the melt output)."""
    rows: list[tuple] = []

    def iri(s, p, o):
        rows.append((s, p, o, True, None, None))

    def lit(s, p, o, lang=None):
        rows.append((s, p, o, False, lang, None))

    for scheme, comment in CLASSES:
        s = vocab.GN + scheme
        iri(s, vocab.RDF_TYPE, GN_CLASS_TYPE)
        lit(s, RDFS_COMMENT, comment, "en")
    for code, scheme, label, definition in CONCEPTS:
        s = vocab.GN + code
        iri(s, vocab.RDF_TYPE, SKOS_CONCEPT_TYPE)
        lit(s, SKOS_NOTATION, code)
        iri(s, SKOS_IN_SCHEME, vocab.GN + scheme)
        lit(s, SKOS_PREF_LABEL, label, "en")
        if definition is not None:
            lit(s, SKOS_DEFINITION, definition, "en")
    iri(vocab.WDT_P439, vocab.RDF_TYPE, OWL_DATATYPE_PROPERTY)
    for lang, label in PROPERTY_LABELS:
        lit(vocab.WDT_P439, SKOS_PREF_LABEL, label, lang)
    return rows


def ontology_triples(spark: SparkSession) -> DataFrame:
    """The static block as a (tiny, broadcast-sized) triple DataFrame."""
    return spark.createDataFrame(
        ontology_triple_rows(),
        schema="subj string, pred string, obj string, obj_is_iri boolean,"
               " obj_lang string, obj_dt string",
    )


def concept_labels() -> list[tuple[str, str]]:
    """(code_iri, prefLabel@en) pairs — the C12 join dimension."""
    return [(vocab.GN + code, label) for code, _, label, _ in CONCEPTS]


def oracle_values_sql() -> str:
    """The identical static block as a DuckDB VALUES table (oracle twin)."""
    def q(v):
        if v is None:
            return "CAST(NULL AS VARCHAR)"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        return "'" + str(v).replace("'", "''") + "'"

    vals = ",\n  ".join(
        "(" + ", ".join(q(v) for v in row) + ")" for row in ontology_triple_rows()
    )
    return (
        "SELECT * FROM (VALUES\n  " + vals +
        "\n) AS ont(subj, pred, obj, obj_is_iri, obj_lang, obj_dt)"
    )
