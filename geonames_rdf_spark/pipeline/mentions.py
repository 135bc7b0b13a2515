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

import os

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
    from_html: bool = False,
    matcher_bc=None,
) -> DataFrame:
    """(url, surface, begin, end, candidate[, lang]) — one row per candidate.

    ``carry_lang=True`` propagates the page language with each mention so
    the linker's context feature needs NO join back to the (huge) page
    table — context rides the narrow mention stream instead.

    ``from_html=True`` FUSES text extraction into the scan batch (one
    Python/Arrow hop instead of two): at high parallelism every chained
    pandas stage is its own Python worker per task slot, and the extra
    hop's Arrow ser/deser + process oversubscription measurably
    anti-scales (see BENCH.md).  Extraction semantics are byte-identical
    (same ``extract.extract_text_py`` pure function).

    ``matcher_bc``: a pre-broadcast matcher (``sc.broadcast(
    build_matcher(surface_map))``) to reuse across scans — each NEW
    broadcast makes every worker unpickle (and, for the regex backend,
    recompile) its copy, a per-job fixed cost that belongs outside any
    repeated/incremental scan loop.
    """
    spark = pages.sparkSession
    if matcher_bc is not None:
        # the broadcast matcher supersedes ``surface_map`` — guard against
        # a caller passing a DIFFERENT map than the one bundled (results
        # would silently come from the stale broadcast).  CONTENT
        # fingerprint, not just count: an equal-size map of different
        # surfaces is exactly the failure the guard exists for.
        from geonames_rdf_spark.pipeline.matcher import surface_fingerprint

        fp_bc = getattr(matcher_bc.value, "fingerprint", None)
        fp_map = surface_fingerprint(surface_map)
        if fp_bc != fp_map:
            raise ValueError(
                f"detect_mentions: matcher_bc fingerprint {fp_bc} !="
                f" surface_map fingerprint {fp_map} (count, key-hash) —"
                " stale/mismatched broadcast")
        bc = matcher_bc
    else:
        from geonames_rdf_spark.pipeline.matcher import surface_fingerprint

        bc = _memoized_broadcast(
            spark, "matcher", surface_fingerprint(surface_map),
            lambda: build_matcher(surface_map))
    text_col = "html" if from_html else "text"
    cols = ["url", text_col] + (["lang"] if carry_lang else [])
    if from_html:
        from geonames_rdf_spark.pipeline.extract import extract_text_py

    def scan(batches):
        ac = bc.value
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in
                                     ("url", "surface", "begin", "end",
                                      "candidates")}
            if carry_lang:
                rows["lang"] = []
            # Series -> list once: per-element pandas indexing in the row
            # loop costs more than the scan itself on short pages
            urls = pdf["url"].tolist()
            texts = pdf[text_col].tolist()
            langs = pdf["lang"].tolist() if carry_lang else urls
            for url, text, lang in zip(urls, texts, langs):
                if from_html:
                    text = extract_text_py(text) if text is not None else None
                if not text:
                    continue
                for start, pat, payload in ac.scan(text):
                    # ONE row per match; the candidate fan-out (Zipf-hot
                    # surfaces carry many ids) explodes JVM-side below —
                    # ~|candidates|x less data across the Arrow boundary
                    rows["url"].append(url)
                    rows["surface"].append(pat)
                    rows["begin"].append(start)
                    rows["end"].append(start + len(pat))
                    rows["candidates"].append(payload)
                    if carry_lang:
                        rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    match_schema = ("url string, surface string, begin int, end int,"
                    " candidates array<bigint>")
    out_cols = ["url", "surface", "begin", "end",
                F.explode("candidates").alias("candidate")]
    if carry_lang:
        match_schema += ", lang string"
        out_cols.append("lang")
    return pages.select(*cols).mapInPandas(scan, schema=match_schema).select(
        *out_cols)


def detect_mentions_sharded(
    pages: DataFrame,
    surface_map: dict[str, list[int]],
    shards: int = 4,
    carry_lang: bool = False,
) -> DataFrame:
    """Mention scan for pattern sets too large for ONE broadcast matcher
    (DESIGN.md ceiling: ~8M surfaces for the regex backend, ~4M for the
    dict-trie).  The pattern set splits into ``shards`` deterministic
    md5-keyed shards, each scanned as its own broadcast pass; the union
    is narrow (no shuffle added) and equals the single-pass scan exactly
    because pattern sets are independent in Aho-Corasick semantics —
    every (start, pattern) occurrence is found by exactly the shard
    owning that pattern.

    Per-executor memory is bounded by the LARGEST shard, at the cost of
    scanning the text ``shards`` times — the trade a 13M-surface
    gazetteer needs when the C-extension backend is unavailable.
    """
    import hashlib

    parts: list[dict[str, list[int]]] = [{} for _ in range(shards)]
    for pat, payload in surface_map.items():
        h = int.from_bytes(hashlib.md5(pat.encode("utf-8")).digest()[:4], "little")
        parts[h % shards][pat] = payload
    out = None
    for part in parts:
        if not part:
            continue
        scan = detect_mentions(pages, part, carry_lang=carry_lang)
        out = scan if out is None else out.unionByName(scan)
    if out is None:
        return detect_mentions(pages, {}, carry_lang=carry_lang)
    return out


# --- fused scan + link (the 100 TB hot path) -------------------------------

# worker-side bundle cache: (abs path, size, mtime) -> (matcher, scored_map).
# Keyed on file identity, not just name, so a re-shipped bundle with new
# content is reloaded; hit = zero per-job cost after the first task.
_BUNDLE_CACHE: dict = {}

# Driver-side broadcast memo (optimization r09): building the automaton +
# broadcasting it is a per-CALL fixed cost — driver trie/regex compile +
# pickle, then every Python worker unpickles AND recompiles the regex
# program once per broadcast id.  Repeated scans over the same gazetteer
# (bench passes, incremental micro-batches, the per-bucket resume loop)
# paid it every time.  Memoized on the CONTENT fingerprint (count +
# per-item hash — the same fingerprint the stale-broadcast guards already
# use, computed in this same driver process), so a changed gazetteer
# broadcasts fresh; one live entry per kind bounds memory.  This reuses a
# *dimension* broadcast, never results: every scan still computes from
# its input pages.
_BC_MEMO: dict = {}


def _memoized_broadcast(spark, kind: str, fp: tuple, builder):
    sc = spark.sparkContext
    hit = _BC_MEMO.get(kind)
    if hit is not None and hit[0] == fp and hit[2] is sc:
        return hit[1]
    bc = sc.broadcast(builder())
    _BC_MEMO[kind] = (fp, bc, sc)
    return bc


def save_matcher_bundle(scored_map: dict, path: str) -> dict:
    """Serialize (matcher, scored_map) once to ``path`` for SparkFiles
    distribution — the build-once alternative to per-job collect +
    broadcast (VERDICT r04 next-round #4).

    At gazetteer scales where ``build_scored_surface_map`` costs
    minutes/GBs on the driver (measured: scripts/matcher_build_cost.py,
    DESIGN.md ceiling table), the deployment shape is: ONE offline job
    builds the map and writes this bundle; every scan job ships the FILE
    (``detect_and_link(..., bundle_file=...)``) — no per-job py4j
    collect, no per-job broadcast ser/deser, and workers reuse the
    deserialized bundle across jobs via ``_BUNDLE_CACHE``.

    Returns {"bytes": pickled size, "surfaces": len(scored_map)}.
    """
    import pickle

    bundle = (build_matcher({k: [] for k in scored_map}), scored_map)
    with open(path, "wb") as f:
        pickle.dump(bundle, f, protocol=pickle.HIGHEST_PROTOCOL)
    return {"bytes": os.path.getsize(path), "surfaces": len(scored_map)}


def _load_bundle_cached(name: str):
    """Worker-side: resolve a SparkFiles-shipped bundle and memoize the
    deserialized (matcher, scored_map) per Python worker process."""
    import pickle

    from pyspark import SparkFiles

    path = SparkFiles.get(name)
    st = os.stat(path)
    key = (path, st.st_size, int(st.st_mtime))
    hit = _BUNDLE_CACHE.get(key)
    if hit is None:
        with open(path, "rb") as f:
            hit = pickle.load(f)
        _BUNDLE_CACHE.clear()  # one live bundle per worker (they are big)
        _BUNDLE_CACHE[key] = hit
    return hit


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


def detect_and_link(pages,
                    scored_map: dict[str, list[tuple[int, float, str]]] | None,
                    lang_bonus: float = 2.0, from_html: bool = False,
                    bundle_bc=None, bundle_file: str | None = None):
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
    # ``bundle_bc``: pre-broadcast (matcher, scored_map) pair — reuse it
    # across scans so workers unpickle/compile the matcher once per job.
    # When supplied it SUPERSEDES ``scored_map``; the guard catches a
    # caller passing a different map than the bundled one (which would
    # silently score from the stale broadcast).  Identity short-circuits
    # (the per-bucket loop passes the same object); otherwise a CONTENT
    # fingerprint over keys AND scored payloads — same surfaces with
    # different priors must not slip through either.
    if bundle_file is not None:
        # SparkFiles path: the bundle was written by save_matcher_bundle;
        # ship the FILE (torrent-style, once per executor) instead of
        # collecting + broadcasting per job.  scored_map may be None —
        # the bundle is the source of truth here.
        if bundle_bc is not None:
            raise ValueError("pass bundle_bc or bundle_file, not both")
        name = os.path.basename(bundle_file)
        path = os.path.abspath(bundle_file)
        # keyed by BASENAME, not path: SparkFiles resolves files by
        # basename, so two different bundles sharing a basename in one
        # SparkContext would silently serve the first file to workers
        # (or fail the second addFile) — refuse loudly instead
        # (ADVICE r05).
        added = getattr(spark.sparkContext, "_graft_shipped_bundles", None)
        if added is None:
            added = {}
            spark.sparkContext._graft_shipped_bundles = added
        prev = added.get(name)
        if prev is None:
            spark.sparkContext.addFile(bundle_file)
            added[name] = path
        elif prev != path:
            raise ValueError(
                f"detect_and_link: a different bundle path ({prev}) was"
                f" already shipped under basename {name!r} in this"
                " SparkContext; SparkFiles resolves by basename, so the"
                f" new path ({path}) cannot be distinguished on workers."
                " Write bundles under unique filenames (e.g. embed a"
                " content hash).")
        bc = None
    elif bundle_bc is not None:
        bundled_map = bundle_bc.value[1]
        if bundled_map is not scored_map:
            from geonames_rdf_spark.pipeline.matcher import scored_fingerprint

            fp_b, fp_m = (scored_fingerprint(bundled_map),
                          scored_fingerprint(scored_map))
            if fp_b != fp_m:
                raise ValueError(
                    f"detect_and_link: bundle_bc fingerprint {fp_b} !="
                    f" scored_map fingerprint {fp_m} (count, item-hash) —"
                    " stale/mismatched broadcast")
        bc = bundle_bc
    else:
        from geonames_rdf_spark.pipeline.matcher import scored_fingerprint

        bc = _memoized_broadcast(
            spark, "bundle", scored_fingerprint(scored_map),
            lambda: (build_matcher({k: [] for k in scored_map}), scored_map))
    text_col = "html" if from_html else "text"
    if from_html:
        from geonames_rdf_spark.pipeline.extract import extract_text_py

    def scan(batches):
        ac, smap = (_load_bundle_cached(name) if bc is None
                    else bc.value)
        lang_cc = {k: f"C{v}" for k, v in LANG_COUNTRY.items()}
        for pdf in batches:
            rows = {c: [] for c in
                    ("url", "surface", "begin", "end", "geonameid", "score")}
            for url, text, lang in zip(pdf["url"].tolist(),
                                       pdf[text_col].tolist(),
                                       pdf["lang"].tolist()):
                if from_html:
                    text = extract_text_py(text) if text is not None else None
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

    return pages.select("url", text_col, "lang").mapInPandas(
        scan,
        schema="url string, surface string, begin int, end int,"
               " geonameid bigint, score double",
    )
