"""Hand-derived golden triples for every alternateNames.rq branch
(FIXTURES.md §2 item 9) and the best-name file-order rule (item 10).

Each input row below was traced through the reference query by hand
(alternateNames.rq:24-109, compute-bestnames.sh:31-61); the expected
triple set is written out literally — no shared code with the operator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from geonames_rdf_spark import vocab
from geonames_rdf_spark.operators import altnames, preshape

ALT_SCHEMA = T.StructType([
    T.StructField("alternateNameId", T.LongType()),
    T.StructField("geonameid", T.LongType()),
    T.StructField("isolanguage", T.StringType()),
    T.StructField("alternateName", T.StringType()),
    T.StructField("isPreferredName", T.StringType()),
    T.StructField("isShortName", T.StringType()),
])

S = vocab.SWS + "7/"

ROWS = [
    # (id, gid, lang, name, pref, short)
    (1, 7, "en", "Plain English", "", ""),          # tagged alternateName@en
    (2, 7, "de", "Deutscher Name", "", ""),         # tagged alternateName@de
    (3, 7, "", "Untagged", "", ""),                 # plain alternateName
    (4, 7, None, "NullLang", "", ""),               # plain alternateName
    (5, 7, "en", "Official One", "1", ""),          # officialName@en, no alt
    (6, 7, "en", "Shorty", "", "1"),                # shortName@en, no alt
    (7, 7, "link", "Shortlink", "", "1"),           # shortName PLAIN (link tag)
    (8, 7, "post", "80331", "", ""),                # postalCode, no alt
    (9, 7, "abcd", "BadTag", "", ""),               # 4-letter tag -> dropped
    (10, 7, "link", "https://en.wikipedia.org/wiki/Munich Town", "", ""),
    #   -> wikipediaArticle + dbpedia with %20 encoding
    (11, 7, "link", "https://en.wikipedia.org/wiki/Already%20Enc", "", ""),
    #   -> dbpedia uses title as-is (contains '%')
    (12, 7, "link", "https://de.wikipedia.org/wiki/Muenchen", "", ""),
    #   -> wikipediaArticle only (not en -> no dbpedia)
    (13, 7, "link", "not a url", "", ""),            # regex fails -> nothing
    (14, 7, "post", "99999", "1", ""),               # postal even when pref=1
]

EXPECTED = {
    (S, vocab.GN_ALTERNATE_NAME, "Plain English", False, "en", None),
    (S, vocab.GN_ALTERNATE_NAME, "Deutscher Name", False, "de", None),
    (S, vocab.GN_ALTERNATE_NAME, "Untagged", False, None, None),
    (S, vocab.GN_ALTERNATE_NAME, "NullLang", False, None, None),
    (S, vocab.GN_OFFICIAL_NAME, "Official One", False, "en", None),
    (S, vocab.GN_SHORT_NAME, "Shorty", False, "en", None),
    (S, vocab.GN_SHORT_NAME, "Shortlink", False, None, None),
    (S, vocab.GN_POSTAL_CODE, "80331", False, None, None),
    (S, vocab.GN_POSTAL_CODE, "99999", False, None, None),
    (S, vocab.GN_WIKIPEDIA_ARTICLE,
     "https://en.wikipedia.org/wiki/Munich Town", True, None, None),
    (S, vocab.RDFS_SEE_ALSO,
     "https://dbpedia.org/resource/Munich%20Town", True, None, None),
    (S, vocab.GN_WIKIPEDIA_ARTICLE,
     "https://en.wikipedia.org/wiki/Already%20Enc", True, None, None),
    (S, vocab.RDFS_SEE_ALSO,
     "https://dbpedia.org/resource/Already%20Enc", True, None, None),
    (S, vocab.GN_WIKIPEDIA_ARTICLE,
     "https://de.wikipedia.org/wiki/Muenchen", True, None, None),
}


@pytest.fixture(scope="module")
def alt_df(spark):
    return spark.createDataFrame(
        [r + ("", "", "", "") for r in ROWS],
        ALT_SCHEMA.add("isColloquial", "string").add("isHistoric", "string")
        .add("valid_from", "string").add("valid_to", "string"),
    )


def test_altname_branches_golden(alt_df):
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_is_iri"], r["obj_lang"], r["obj_dt"])
        for r in altnames.alt_name_triples(alt_df).collect()
    }
    assert got == EXPECTED


def test_bestname_first_in_file_order(spark, alt_df):
    """compute-bestnames.sh keeps the FIRST 'en' row in file order — the
    preferred flag never overrides an earlier row (the awk only sets when
    unset, compute-bestnames.sh:47-56)."""
    best = {r["geonameid"]: r["bestNameCandidate"]
            for r in preshape.best_names(alt_df).collect()}
    # row 1 ('Plain English') precedes the preferred row 5 ('Official One')
    assert best == {7: "Plain English"}

    # preferred row first => it wins (it is simply the first 'en' row)
    flipped = spark.createDataFrame(
        [(1, 8, "en", "Preferred First", "1", "", "", "", "", ""),
         (2, 8, "en", "Later Plain", "", "", "", "", "", "")],
        alt_df.schema,
    )
    assert {r["geonameid"]: r["bestNameCandidate"]
            for r in preshape.best_names(flipped).collect()} == {8: "Preferred First"}
