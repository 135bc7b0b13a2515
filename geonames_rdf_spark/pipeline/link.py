"""Entity-link scoring and resolution (stage S4).

score = population prior + language-context bonus; per-mention argmax via
a window over (url, begin) with deterministic geonameid tie-break.  The
feature-attribute side is dimension-sized -> broadcast join; the argmax
shuffle is keyed by url (uniform), so hot toponyms cause no skew here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic page-language -> country-code-digit affinity used by the
# synthetic corpus; a real deployment derives this from feature country
LANG_COUNTRY = {"en": 0, "de": 1, "fr": 2}


def link_mentions(
    mentions: DataFrame,
    features: DataFrame,
    pages: DataFrame | None = None,
) -> DataFrame:
    """Resolve each (url, begin) mention to its best candidate.

    ``features`` needs (geonameid, population, country_code).  Returns
    (url, surface, begin, end, geonameid, score).
    """
    attrs = F.broadcast(
        features.select(
            F.col("geonameid").alias("candidate"),
            F.coalesce(F.col("population"), F.lit(0)).alias("_pop"),
            F.col("country_code").alias("_cc"),
        )
    )
    m = mentions.join(attrs, "candidate", "left")
    score = F.log10(F.col("_pop") + 1)
    if pages is not None:
        lang_map = F.create_map(
            *[x for k, v in LANG_COUNTRY.items() for x in (F.lit(k), F.lit(f"C{v}"))]
        )
        m = m.join(pages.select("url", "lang"), "url", "left")
        score = score + F.when(
            F.col("_cc") == lang_map[F.col("lang")], F.lit(2.0)
        ).otherwise(F.lit(0.0))
    m = m.withColumn("score", score)
    w = Window.partitionBy("url", "begin").orderBy(
        F.desc("score"), F.asc("candidate")
    )
    return (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "url", "surface", "begin", "end",
            F.col("candidate").alias("geonameid"),
            F.round(F.col("score"), 6).alias("score"),
        )
    )
