"""Hand-derived golden triples for the places.rq rule cluster
(FIXTURES.md §2 items 1-8): required-column row drops, sentinel guards,
self-parent exclusion, ADM1 override, PCLI proximity, consolidation
filters, hierarchy fallback.  A minimal hand-written world, expectations
traced through places.rq/consolidate.rq on paper.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from geonames_rdf_spark import vocab
from geonames_rdf_spark.operators import places, preshape
from geonames_rdf_spark.sources.tsv import FEATURES_SCHEMA, HIERARCHY_SCHEMA

D = datetime.date(2021, 5, 4)


def row(gid, cls, code, cc, a1="", a2="", a3="", a4="", pop=100, elev=None,
        dem=500, name=None, ascii_=None, lat=10.0, lon=20.0):
    name = name or f"N{gid}"
    return (gid, name, ascii_ or f"a{gid}", "", lat, lon, cls, code, cc, "",
            a1, a2, a3, a4, pop, elev, dem, "Etc/UTC", D, None, None, name)


ROWS = [
    row(1, "A", "PCLI", "X"),                                  # country
    row(10, "A", "ADM1", "X", a1="1"),                         # ADM1
    row(20, "A", "ADM2", "X", a1="1", a2="2"),                 # ADM2
    row(30, "A", "ADM3", "X", a1="1", a2="2", a3="3"),         # ADM3
    # place with full chain -> parent = ADM3 30
    row(100, "P", "PPL", "X", a1="1", a2="2", a3="3", pop=0, elev=7, dem=-9999),
    # place with admin3='NONE' -> falls to ADM2 (places.rq:112-114)
    row(101, "P", "PPL", "X", a1="1", a2="2", a3="NONE"),
    # place with admin4 set but admin3 empty -> adm4 ignored (rq:115-117)
    row(102, "P", "PPL", "X", a1="1", a2="2", a4="9"),
    # place with no admin codes at all -> hierarchy fallback (rq:164-182)
    row(103, "P", "PPL", "X"),
    # place whose country has no PCLI row -> dropped (inner country join)
    row(104, "P", "PPL", "Y", a1="1"),
    # population NULL -> dropped entirely (required pattern)
    row(105, "P", "PPL", "X", a1="1", pop=None),
    # alt: elevation NULL + dem -9999 -> no alt triple (consolidate:40-53)
    row(106, "P", "PPL", "X", a1="1", dem=-9999),
]

HIER = [(1, 103, "ADM"), (999999, 102, "ADM")]  # second edge: non-country parent


@pytest.fixture(scope="module")
def kg(spark):
    feats = spark.createDataFrame(ROWS, FEATURES_SCHEMA)
    feats = preshape.add_admin_keys(feats.drop("adm1", "adm2"))
    # bestName = name (no alternate names in this fixture)
    feats = feats.withColumn("bestName", F.col("name"))
    cc = preshape.derive_country_codes(feats)
    lookups = {lvl: preshape.derive_admin_lookup(feats, lvl) for lvl in (1, 2, 3, 4)}
    hier = preshape.filter_country_hierarchy(
        spark.createDataFrame(HIER, HIERARCHY_SCHEMA), cc
    )
    wide = places.feature_entities(feats, cc, lookups, hier)
    t = places.melt_feature_triples(wide, consolidate=True).cache()
    t.count()
    yield t
    t.unpersist()


def uri(g):
    return f"{vocab.SWS}{g}/"


def objs(kg, gid, pred):
    return {r["obj"] for r in kg.filter(
        (F.col("subj") == uri(gid)) & (F.col("pred") == pred)).collect()}


def test_subjects_present_and_dropped(kg):
    subs = {r["subj"] for r in kg.select("subj").distinct().collect()}
    assert uri(104) not in subs   # country 'Y' has no PCLI row
    assert uri(105) not in subs   # NULL population -> required pattern fails
    for g in (1, 10, 20, 30, 100, 101, 102, 103, 106):
        assert uri(g) in subs


def test_parent_resolution_rules(kg):
    P = vocab.GN_PARENT_FEATURE
    assert objs(kg, 100, P) == {uri(30)}   # full chain -> ADM3
    assert objs(kg, 101, P) == {uri(20)}   # 'NONE' admin3 -> ADM2
    assert objs(kg, 102, P) == {uri(20)}   # admin4 without admin3 ignored
    assert objs(kg, 103, P) == {uri(1)}    # hierarchy (country-level) fallback
    assert objs(kg, 10, P) == {uri(1)}     # ADM1 override -> parentCountry
    assert objs(kg, 30, P) == {uri(20)}    # ADM3 self-match excluded -> ADM2
    assert objs(kg, 1, P) == set()         # country: no parent anywhere


def test_adm4_guard_no_parent_adm4(kg):
    assert objs(kg, 102, vocab.GN_PARENT_ADM4) == set()


def test_pcli_and_adm1_consolidation(kg):
    assert objs(kg, 1, vocab.GN_NEIGHBOURING_FEATURES) == {uri(1) + "neighbours.rdf"}
    assert objs(kg, 1, vocab.GN_PARENT_COUNTRY) == set()       # consolidate:18-22
    assert objs(kg, 10, vocab.GN_NEARBY_FEATURES) == set()     # consolidate:25-31
    assert objs(kg, 100, vocab.GN_NEARBY_FEATURES) == {uri(100) + "nearby.rdf"}


def test_population_and_alt_filters(kg):
    assert objs(kg, 100, vocab.GN_POPULATION) == set()      # pop 0 dropped
    assert objs(kg, 100, vocab.WGS84_ALT) == {"7"}          # elevation wins
    assert objs(kg, 106, vocab.WGS84_ALT) == set()          # -9999 dropped
    assert objs(kg, 101, vocab.GN_POPULATION) == {"100"}
