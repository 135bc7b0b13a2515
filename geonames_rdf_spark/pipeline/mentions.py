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

from geonames_rdf_spark.pipeline.matcher import build_matcher

MENTION_SCHEMA = (
    "url string, surface string, begin int, end int, candidate bigint"
)
MENTION_SCHEMA_LANG = MENTION_SCHEMA + ", lang string"


def build_surface_map(features_with_bestname: DataFrame) -> dict[str, list[int]]:
    """surface form -> sorted candidate geonameids (driver-side, dimension)."""
    rows = (
        features_with_bestname.select("bestName", "geonameid")
        .groupBy("bestName").agg(F.sort_array(F.collect_set("geonameid")).alias("ids"))
        .collect()
    )
    return {r["bestName"]: list(r["ids"]) for r in rows if r["bestName"]}


def detect_mentions(
    pages: DataFrame,
    surface_map: dict[str, list[int]],
    carry_lang: bool = False,
) -> DataFrame:
    """(url, surface, begin, end, candidate[, lang]) — one row per candidate.

    ``carry_lang=True`` propagates the page language with each mention so
    the linker's context feature needs NO join back to the (huge) page
    table — context rides the narrow mention stream instead.
    """
    spark = pages.sparkSession
    bc = spark.sparkContext.broadcast(build_matcher(surface_map))
    cols = ["url", "text"] + (["lang"] if carry_lang else [])

    def scan(batches):
        ac = bc.value
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in
                                     ("url", "surface", "begin", "end", "candidate")}
            if carry_lang:
                rows["lang"] = []
            langs = pdf["lang"] if carry_lang else pdf["url"]
            for url, text, lang in zip(pdf["url"], pdf["text"], langs):
                if not text:
                    continue
                for start, pat, payload in ac.scan(text):
                    for cid in payload:
                        rows["url"].append(url)
                        rows["surface"].append(pat)
                        rows["begin"].append(start)
                        rows["end"].append(start + len(pat))
                        rows["candidate"].append(cid)
                        if carry_lang:
                            rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    schema = MENTION_SCHEMA_LANG if carry_lang else MENTION_SCHEMA
    return pages.select(*cols).mapInPandas(scan, schema=schema)


# --- fused scan + link (the 100 TB hot path) -------------------------------

def build_scored_surface_map(features) -> dict[str, list[tuple[int, float, str]]]:
    """surface -> [(geonameid, log10(pop+1), country_code)], candidates
    pre-sorted by (-prior, id) so in-scan argmax is a short forward pass."""
    import math

    rows = (
        features.select("bestName", "geonameid", "population", "country_code")
        .collect()
    )
    out: dict[str, list[tuple[int, float, str]]] = {}
    for r in rows:
        if not r["bestName"]:
            continue
        prior = round(math.log10((r["population"] or 0) + 1), 6)
        out.setdefault(r["bestName"], []).append(
            (int(r["geonameid"]), prior, r["country_code"])
        )
    for v in out.values():
        v.sort(key=lambda t: (-t[1], t[0]))
    return out


def detect_and_link(pages, scored_map: dict[str, list[tuple[int, float, str]]],
                    lang_bonus: float = 2.0):
    """Mention detection + candidate scoring + per-mention argmax, all
    inside the Arrow batch — the candidate fan-out for hot toponyms never
    materializes, so NOTHING shuffles per candidate (the downstream
    mention-triple dedup is the only exchange).  Scoring semantics are
    identical to ``link.link_mentions`` (population prior + language
    bonus, ties to the lowest geonameid); equivalence is pinned by
    tests/test_pipeline.py::test_fused_link_equivalence.

    Returns (url, surface, begin, end, geonameid, score).
    """
    from geonames_rdf_spark.pipeline.link import LANG_COUNTRY

    spark = pages.sparkSession
    bc = spark.sparkContext.broadcast(
        (build_matcher({k: [] for k in scored_map}), scored_map)
    )

    def scan(batches):
        ac, smap = bc.value
        lang_cc = {k: f"C{v}" for k, v in LANG_COUNTRY.items()}
        for pdf in batches:
            rows = {c: [] for c in
                    ("url", "surface", "begin", "end", "geonameid", "score")}
            for url, text, lang in zip(pdf["url"], pdf["text"], pdf["lang"]):
                if not text:
                    continue
                bonus_cc = lang_cc.get(lang)
                for start, pat, _ in ac.scan(text):
                    best_id, best_score = None, None
                    for cid, prior, cc in smap[pat]:
                        s = prior + (lang_bonus if cc == bonus_cc else 0.0)
                        if best_score is None or s > best_score or (
                            s == best_score and cid < best_id
                        ):
                            best_id, best_score = cid, s
                        elif prior + lang_bonus < best_score:
                            # candidates sorted by prior desc: nothing later
                            # can beat OR tie best even with the bonus
                            break
                    rows["url"].append(url)
                    rows["surface"].append(pat)
                    rows["begin"].append(start)
                    rows["end"].append(start + len(pat))
                    rows["geonameid"].append(best_id)
                    rows["score"].append(round(best_score, 6))
            yield pd.DataFrame(rows)

    return pages.select("url", "text", "lang").mapInPandas(
        scan,
        schema="url string, surface string, begin int, end int,"
               " geonameid bigint, score double",
    )
