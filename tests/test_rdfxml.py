"""RDF/XML reader (sources/rdfxml.py) + static ontology fixture parity."""

from __future__ import annotations

import os

import pytest

from geonames_rdf_spark.sources import ontology
from geonames_rdf_spark.sources.rdfxml import parse_rdfxml, read_rdfxml_file

REF_ONTOLOGY = "/root/reference/output/ontology_v3.3_modified.rdf"

DOC = """<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xml:base="http://example.org/onto"
         xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#"
         xmlns:ex="http://example.org/v#">
  <ex:Code rdf:about="#A.X" skos:notation="A.X">
    <skos:prefLabel xml:lang="en">alpha</skos:prefLabel>
    <skos:inScheme rdf:resource="#A"/>
    <ex:count rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">3</ex:count>
    <ex:note>line one
line two</ex:note>
  </ex:Code>
  <rdf:Description rdf:about="http://example.org/abs">
    <ex:nested>
      <ex:Thing>
        <skos:prefLabel>inner</skos:prefLabel>
      </ex:Thing>
    </ex:nested>
    <ex:chain rdf:parseType="Collection">
      <rdf:Description rdf:about="#p"/>
      <rdf:Description rdf:about="#q"/>
    </ex:chain>
  </rdf:Description>
</rdf:RDF>
"""

EX = "http://example.org/v#"
B = "http://example.org/onto"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
SKOS = "http://www.w3.org/2004/02/skos/core#"


def test_parse_core_constructs():
    t = set(parse_rdfxml(DOC))
    # typed node element => rdf:type; base-resolved subject
    assert (f"{B}#A.X", RDF + "type", EX + "Code", True, None, None) in t
    # property ATTRIBUTE => plain literal
    assert (f"{B}#A.X", SKOS + "notation", "A.X", False, None, None) in t
    # lang literal / resource / datatyped literal
    assert (f"{B}#A.X", SKOS + "prefLabel", "alpha", False, "en", None) in t
    assert (f"{B}#A.X", SKOS + "inScheme", f"{B}#A", True, None, None) in t
    assert (f"{B}#A.X", EX + "count", "3", False, None,
            "http://www.w3.org/2001/XMLSchema#integer") in t
    # multiline literal preserved byte-for-byte
    assert (f"{B}#A.X", EX + "note", "line one\nline two",
            False, None, None) in t


def test_parse_nested_node_and_collection():
    t = parse_rdfxml(DOC)
    byp = {}
    for s, p, o, is_iri, _, _ in t:
        byp.setdefault(p, []).append((s, o, is_iri))
    # nested node element becomes a deterministic blank node
    (s, o, is_iri), = byp[EX + "nested"]
    assert s == "http://example.org/abs" and o.startswith("_:") and is_iri
    assert ("_:" + o[2:], RDF + "type", EX + "Thing", True, None, None) in t
    # rdf:parseType="Collection" => first/rest list ending in rdf:nil
    (_, head, _), = byp[EX + "chain"]
    firsts = {s: o for s, o, _ in byp[RDF + "first"]}
    rests = {s: o for s, o, _ in byp[RDF + "rest"]}
    assert firsts[head] == f"{B}#p"
    assert firsts[rests[head]] == f"{B}#q"
    assert rests[rests[head]] == RDF + "nil"


def test_deterministic_blank_node_labels():
    assert parse_rdfxml(DOC) == parse_rdfxml(DOC)


def test_unsupported_constructs_raise():
    bad = DOC.replace('rdf:parseType="Collection"', 'rdf:parseType="Literal"')
    with pytest.raises(ValueError):
        parse_rdfxml(bad)
    with pytest.raises(ValueError):
        parse_rdfxml(DOC.replace('rdf:about="#A.X"', 'rdf:about="rel/path"'))


@pytest.mark.skipif(not os.path.exists(REF_ONTOLOGY),
                    reason="reference ontology not present")
def test_fixture_matches_reference_parse():
    """The checked-in parquet fixture == fresh parse of the reference
    ontology + the property-definitions block (regeneration is
    reproducible)."""
    fresh = read_rdfxml_file(REF_ONTOLOGY) + ontology.property_definition_rows()
    assert ontology.ontology_triple_rows() == [tuple(r) for r in fresh]


def test_fixture_concept_inventory():
    rows = ontology.ontology_triple_rows()
    concepts = [r for r in rows if r[1] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
                and r[2] == ontology.SKOS_CONCEPT_TYPE]
    labels = [r for r in rows if r[1] == ontology.SKOS_PREF_LABEL]
    notations = [r for r in rows if r[1] == ontology.SKOS_NOTATION]
    assert len(concepts) == 690          # full ontology v3.3 concept set
    assert len(notations) == 690
    assert len(labels) == 3253           # 3251 ontology + 2 wdt:P439
    assert len(ontology.concept_labels()) == 691  # S.SCHL has 2 en labels
