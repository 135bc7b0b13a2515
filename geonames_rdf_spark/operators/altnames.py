"""Alternate-name classification -> triples (SURVEY.md §2.B25-B26).

Re-expresses ``config/alternateNames.rq`` as Column expressions + one melt.
Each alternate-name row classifies into at most six emissions:

  gn:wikipediaArticle  lang='link' and a wikipedia URL            (rq:34-40)
  rdfs:seeAlso         dbpedia resource from en-wikipedia          (rq:47-60)
  gn:alternateName     cascade: skipped when short=1 or pref=1;
                       lang-tagged for a valid 2-3-letter tag;
                       plain when no tag                           (rq:62-80)
  gn:postalCode        lang='post'                                 (rq:82-88)
  gn:officialName      pref=1 + valid tag, lang-tagged             (rq:91-96)
  gn:shortName         short=1, tagged when tag valid else plain   (rq:99-109)

Empty-string lang/pref/short count as unbound (rq:27-29 FILTER(STR(...))).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geonames_rdf_spark import vocab
from geonames_rdf_spark.functions.terms import feature_uri

WIKI_RE = r"^https?://[a-z-]+\.wikipedia\.org/wiki/"
EN_WIKI_RE = r"^https?://en\.wikipedia\.org/wiki/"
LANG_TAG_RE = r"^[a-z]{2,3}$"


def encode_for_uri(c: Column) -> Column:
    """SPARQL ENCODE_FOR_URI: RFC 3986 percent-encoding of non-unreserved.

    Built on Spark's ``url_encode`` (form encoding) with the space fixed up
    from '+' to '%20'; covers the character set seen in wikipedia titles.
    """
    return F.regexp_replace(F.url_encode(c), r"\+", "%20")


def _nonempty(c: str) -> Column:
    """OPTIONAL + FILTER(STR(?x)) semantics: empty string == unbound."""
    col = F.col(c)
    return F.when(col.isNotNull() & (col != ""), col)


def classify_alt_names(alt_names: DataFrame) -> DataFrame:
    """Wide classification columns; one row in, one row out (no shuffle)."""
    a = alt_names.filter(
        F.col("geonameid").isNotNull() & F.col("alternateName").isNotNull()
    )
    lang = _nonempty("isolanguage")
    pref = _nonempty("isPreferredName")
    short = _nonempty("isShortName")
    name = F.col("alternateName")
    valid_tag = lang.isNotNull() & (lang != "link") & (lang != "post") & lang.rlike(LANG_TAG_RE)

    wiki = F.when((lang == "link") & name.rlike(WIKI_RE), name)
    title = F.regexp_replace(wiki, EN_WIKI_RE, "")
    dbpedia = F.when(
        wiki.isNotNull() & wiki.rlike(EN_WIKI_RE),
        F.concat(
            F.lit(vocab.DBPEDIA),
            F.when(wiki.contains("%"), title).otherwise(encode_for_uri(title)),
        ),
    )

    alt_plain_or_tagged_val = F.when(valid_tag | lang.isNull(), name)
    alt_lang = F.when(valid_tag, lang)
    alternate = F.when(short.isNotNull() & (short == "1"), F.lit(None).cast("string")) \
        .when(pref.isNotNull() & (pref == "1"), F.lit(None).cast("string")) \
        .otherwise(alt_plain_or_tagged_val)

    postal = F.when(lang == "post", name)
    official = F.when((pref == "1") & valid_tag, name)
    official_lang = F.when((pref == "1") & valid_tag, lang)
    short_name = F.when(short == "1", name)
    short_lang = F.when((short == "1") & valid_tag, lang)

    return a.select(
        F.col("geonameid"),
        feature_uri(F.col("geonameid")).alias("subj"),
        wiki.alias("wikipedia_article"),
        dbpedia.alias("dbpedia_resource"),
        alternate.alias("alt_name"),
        alt_lang.alias("alt_lang"),
        postal.alias("postal_code"),
        official.alias("official_name"),
        official_lang.alias("official_lang"),
        short_name.alias("short_name"),
        short_lang.alias("short_lang"),
    )


def melt_alt_name_triples(classified: DataFrame) -> DataFrame:
    """Explode classification into the (subj, pred, obj, ...) triple table."""
    gn = vocab

    def t(pred: str, obj: str, is_iri: bool = False, lang: str | None = None) -> Column:
        return F.struct(
            F.lit(pred).alias("pred"),
            F.col(obj).alias("obj"),
            F.lit(is_iri).alias("obj_is_iri"),
            (F.col(lang) if lang else F.lit(None).cast("string")).alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dt"),
        )

    emissions = F.array(
        t(gn.GN_WIKIPEDIA_ARTICLE, "wikipedia_article", is_iri=True),
        t(gn.RDFS_SEE_ALSO, "dbpedia_resource", is_iri=True),
        t(gn.GN_ALTERNATE_NAME, "alt_name", lang="alt_lang"),
        t(gn.GN_POSTAL_CODE, "postal_code"),
        t(gn.GN_OFFICIAL_NAME, "official_name", lang="official_lang"),
        t(gn.GN_SHORT_NAME, "short_name", lang="short_lang"),
    )
    out = classified.select("subj", F.explode(emissions).alias("e")).select(
        "subj", "e.pred", "e.obj", "e.obj_is_iri", "e.obj_lang", "e.obj_dt"
    )
    return out.filter(F.col("obj").isNotNull())


def alt_name_triples(alt_names: DataFrame) -> DataFrame:
    return melt_alt_name_triples(classify_alt_names(alt_names))


def ags_triples(ags: DataFrame) -> DataFrame:
    """DE municipality-key triples (config/ags-lookup.rq:5-19)."""
    return ags.select(
        feature_uri(F.col("geonameid")).alias("subj"),
        F.lit(vocab.WDT_P439).alias("pred"),
        F.col("ags").alias("obj"),
        F.lit(False).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dt"),
    )
