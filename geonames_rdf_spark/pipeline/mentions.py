"""Toponym mention detection + candidate generation (stage S3).

The Aho-Corasick automaton (surface -> candidate geonameids) is built once
on the driver from the gazetteer and broadcast; the scan runs inside
``mapInPandas`` over Arrow batches.  Candidates are emitted inline (the
surface->candidates map travels WITH the automaton), so the Zipf-skewed
mention->candidate 'join' never shuffles at all — the classic broadcast
defeat of join skew.  For gazetteer sides too big to broadcast, use
``operators.skew.salted_join`` instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geonames_rdf_spark.pipeline.ahocorasick import AhoCorasick

MENTION_SCHEMA = (
    "url string, surface string, begin int, end int, candidate bigint"
)


def build_surface_map(features_with_bestname: DataFrame) -> dict[str, list[int]]:
    """surface form -> sorted candidate geonameids (driver-side, dimension)."""
    rows = (
        features_with_bestname.select("bestName", "geonameid")
        .groupBy("bestName").agg(F.sort_array(F.collect_set("geonameid")).alias("ids"))
        .collect()
    )
    return {r["bestName"]: list(r["ids"]) for r in rows if r["bestName"]}


def detect_mentions(pages: DataFrame, surface_map: dict[str, list[int]]) -> DataFrame:
    """(url, surface, begin, end, candidate) — one row per candidate."""
    spark = pages.sparkSession
    bc = spark.sparkContext.broadcast(AhoCorasick(surface_map))

    def scan(batches):
        ac = bc.value
        for pdf in batches:
            urls, surfaces, begins, ends, cands = [], [], [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                for start, pat, payload in ac.scan(text):
                    for cid in payload:
                        urls.append(url)
                        surfaces.append(pat)
                        begins.append(start)
                        ends.append(start + len(pat))
                        cands.append(cid)
            yield pd.DataFrame(
                {"url": urls, "surface": surfaces, "begin": begins,
                 "end": ends, "candidate": cands}
            )

    return pages.select("url", "text").mapInPandas(scan, schema=MENTION_SCHEMA)
