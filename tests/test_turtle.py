"""Turtle sink golden tests (A6): prefix compaction, subject grouping,
per-part headers, concat-validity (mirrors merge_rdf_files.sh output
shape)."""

from __future__ import annotations

import glob

from geonames_rdf_spark import vocab
from geonames_rdf_spark.pipeline import turtle

TRIPLES_SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean,"
                  " obj_lang string, obj_dt string")


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def test_turtle_block_golden(spark):
    s = vocab.SWS + "42/"
    rows = [
        (s, vocab.RDF_TYPE, vocab.GN_FEATURE, True, None, None),
        (s, vocab.GN_NAME, 'Ber "lin', False, None, None),
        (s, vocab.GN_OFFICIAL_NAME, "Berlin", False, "de", None),
        (s, vocab.GN_POPULATION, "3600000", False, None, vocab.XSD_INTEGER),
        (s, vocab.GN_PARENT_FEATURE, vocab.SWS + "7/", True, None, None),
    ]
    [row] = turtle.to_turtle(_df(spark, rows), sort=True).collect()
    assert row["line"] == (
        '<https://sws.geonames.org/42/> '
        'a gn:Feature ;\n'
        '    gn:name "Ber \\"lin" ;\n'
        '    gn:officialName "Berlin"@de ;\n'
        '    gn:parentFeature <https://sws.geonames.org/7/> ;\n'
        '    gn:population "3600000"^^xsd:integer .'
    )


def test_turtle_prefix_compaction_rules(spark):
    rows = [
        # A.ADM1 local part has a medial dot -> still a valid pname
        ("s1", vocab.GN_FEATURE_CODE, vocab.GN + "A.ADM1", True, None, None),
        # trailing dot would be ambiguous -> stays an IRI ref
        ("s1", vocab.RDFS_SEE_ALSO, vocab.GN + "bad.", True, None, None),
        # unknown namespace stays an IRI ref
        ("s1", vocab.RDFS_SEE_ALSO, "https://example.org/x", True, None, None),
        # digit-leading local part is not a pname
        ("s1", vocab.RDFS_SEE_ALSO, vocab.GN + "1abc", True, None, None),
    ]
    [row] = turtle.to_turtle(_df(spark, rows), sort=True).collect()
    assert "gn:A.ADM1" in row["line"]
    assert f"<{vocab.GN}bad.>" in row["line"]
    assert "<https://example.org/x>" in row["line"]
    assert f"<{vocab.GN}1abc>" in row["line"]


def test_turtle_write_read_write_roundtrip(spark, tmp_path):
    """A8 both ways: write -> read returns the exact triple set, and a
    second write of the read-back is byte-identical (golden)."""
    s = vocab.SWS + "42/"
    rows = [
        (s, vocab.RDF_TYPE, vocab.GN_FEATURE, True, None, None),
        (s, vocab.GN_NAME, 'esc "q\\uote\nline', False, None, None),
        (s, vocab.GN_OFFICIAL_NAME, "Berlin", False, "de", None),
        (s, vocab.GN_POPULATION, "3600000", False, None, vocab.XSD_INTEGER),
        (s, vocab.GN_PARENT_FEATURE, vocab.SWS + "7/", True, None, None),
        ("_:b0", vocab.RDFS_SEE_ALSO, "_:b1", True, None, None),
        ("_:b1", vocab.GN_NAME, "blank", False, None, None),
        ("s-plain", "https://example.org/p", "https://example.org/o",
         True, None, None),
    ]
    t = _df(spark, rows)
    out1 = str(tmp_path / "ttl1")
    turtle.write_turtle(t, out1, sort=True)
    back = turtle.read_turtle(spark, out1)
    assert back.exceptAll(t).count() == 0
    assert t.exceptAll(back).count() == 0
    out2 = str(tmp_path / "ttl2")
    turtle.write_turtle(back.coalesce(1), out2, sort=True)

    def doc(path):
        return "".join(open(p).read() for p in sorted(glob.glob(path + "/part-*")))

    d1, d2 = doc(out1), doc(out2)
    assert d1.strip() and d1 == d2


def test_parse_turtle_rejects_unsupported(spark):
    import pytest

    with pytest.raises(ValueError):
        turtle.parse_turtle_text("<http://e/s> <http://e/p> [ ] .")
    with pytest.raises(ValueError):
        turtle.parse_turtle_text("<http://e/s> <http://e/p> <http://e/o>")
    with pytest.raises(ValueError):
        turtle.parse_turtle_text('gn:x gn:p "v" .')  # undeclared prefix


def test_turtle_write_parts_are_valid_and_concatenable(spark, tmp_path):
    rows = [
        (vocab.SWS + f"{i}/", vocab.GN_NAME, f"n{i}", False, None, None)
        for i in range(20)
    ]
    out = str(tmp_path / "ttl")
    turtle.write_turtle(_df(spark, rows).repartition(3), out)
    parts = sorted(glob.glob(out + "/part-*"))
    assert parts
    all_text = ""
    for p in parts:
        text = open(p).read()
        if text.strip():
            # every non-empty part is a standalone doc: header first
            assert text.startswith("@prefix cc: <")
        all_text += text
    # concatenation keeps every subject block exactly once
    assert all_text.count("gn:name") == 20
    for i in range(20):
        assert f"<{vocab.SWS}{i}/> gn:name \"n{i}\" ." in all_text


def test_turtle_roundtrip_full_kg(spark, tmp_path):
    """The REAL KG — full ontology block included: multiline rdfs
    comments, blank nodes, 5 label languages, typed literals — survives
    Turtle write -> read as an exact multiset."""
    from geonames_rdf_spark.operators import build
    from tests.conftest import SF

    kg = build.build_kg(spark, SF)
    out = str(tmp_path / "kg_ttl")
    turtle.write_turtle(kg, out)
    back = turtle.read_turtle(spark, out)
    assert back.count() == kg.count()
    a = kg.select("subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_dt")
    assert a.exceptAll(back).count() == 0
    assert back.exceptAll(a).count() == 0
