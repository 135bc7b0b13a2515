"""Focused tests for the round-9 optimization changes: each asserts the
optimized path is VALUE-IDENTICAL to the formulation it replaced (the
round's contract — speed may change, results may not)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from geonames_rdf_spark.operators import build, dedup, graph, preshape
from geonames_rdf_spark.pipeline import corpus, mentions

SF = "/root/testdata/sf0.001"


def test_synthesize_pages_vectorized_parity(spark):
    """The numpy-vectorized page generator emits byte-identical rows to
    the row-wise ``page_fields``/``wrap_html`` pure functions."""
    feats = build.gazetteer_tables(spark, SF)["features"]
    surfaces = corpus.gazetteer_surfaces(feats)
    hot = surfaces[:2]
    got = (corpus.synthesize_pages(spark, surfaces, 700)
           .select("url", F.col("warc_ts").cast("long").alias("ts_epoch"),
                   "html", "text", "lang")
           .orderBy("url").toPandas())
    got["html"] = got["html"].map(bytes)
    exp_rows = []
    for i in range(700):
        url, ts, text, lang = corpus.page_fields(i, surfaces, hot)
        exp_rows.append((url, ts, corpus.wrap_html(i, text), text, lang))
    exp = (pd.DataFrame(exp_rows,
                        columns=["url", "ts_epoch", "html", "text", "lang"])
           .sort_values("url").reset_index(drop=True))
    exp["ts_epoch"] = exp["ts_epoch"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_transitive_closure_local_matches_shuffle(spark):
    """frontier='local' (the r09 default, driver-side BFS)
    computes the same (node, depth) closure as the distributed
    checkpointed loop, including on cycles and diamonds."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("b", "d"), ("d", "e"), ("x", "y"),
         ("c", "a"),  # cycle back to the seed
         ("c", "e")],  # diamond: e reachable at depth 3 two ways
        ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    fast = {(r["node"], r["depth"]) for r in
            graph.transitive_closure(edges, seeds,
                                     frontier="local").collect()}
    slow = {(r["node"], r["depth"]) for r in
            graph.transitive_closure(edges, seeds,
                                     frontier="shuffle").collect()}
    assert fast == slow == {("a", 0), ("b", 1), ("c", 2), ("d", 2),
                            ("e", 3)}


def test_transitive_closure_nonconvergence_still_raises(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "d")],
                                  ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    with pytest.raises(graph.FixpointNotConverged):
        graph.transitive_closure(edges, seeds, max_iter=1,
                                 frontier="local")
    # exactly-enough iterations converge without raising
    assert graph.transitive_closure(edges, seeds, max_iter=3,
                                    frontier="local").count() == 4


def test_best_names_minby_matches_window(spark):
    """min_by aggregation == the former window row_number formulation."""
    gaz = build.gazetteer_tables(spark, SF)
    alt = gaz["alt_names"]
    got = preshape.best_names(alt)
    w = Window.partitionBy("geonameid").orderBy(F.col("alternateNameId"))
    exp = (alt.filter(F.col("isolanguage") == "en")
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select("geonameid",
                   F.col("alternateName").alias("bestNameCandidate")))
    g = {(r[0], r[1]) for r in got.collect()}
    e = {(r[0], r[1]) for r in exp.collect()}
    assert g == e and len(g) > 0


def test_build_kg_plan_memo_returns_fresh_datasets(spark):
    """The prepared-plan memo must hand out DISTINCT Dataset objects
    (identical objects would share shuffle/broadcast execution state
    across actions — a silent cross-run intermediate cache), with
    identical content."""
    df1 = build.build_kg(spark, SF)
    df2 = build.build_kg(spark, SF)
    assert df1 is not df2
    assert df1.schema == df2.schema
    assert df1.count() == df2.count()


def test_gazetteer_tables_memo_isolated_from_caller_mutation(spark):
    t1 = build.gazetteer_tables(spark, SF)
    marker = t1["features"].limit(1)
    t1["features"] = marker
    t1["admin_lookups"][1] = marker
    t2 = build.gazetteer_tables(spark, SF)
    assert t2["features"] is not marker
    assert t2["admin_lookups"][1] is not marker


def test_matcher_broadcast_memo_keyed_on_content(spark):
    """Same scored map content -> same broadcast reused; different
    content -> fresh broadcast (the stale-broadcast failure the
    fingerprint guards exist for)."""
    m1 = {"Alpha": [(1, 0.5, "C0")], "Beta": [(2, 0.1, "C1")]}
    m2 = {"Alpha": [(1, 0.5, "C0")], "Beta": [(2, 0.1, "C1")]}
    m3 = {"Alpha": [(1, 0.9, "C0")], "Beta": [(2, 0.1, "C1")]}  # new prior
    from geonames_rdf_spark.pipeline.matcher import scored_fingerprint
    b1 = mentions._memoized_broadcast(
        spark, "bundle", scored_fingerprint(m1), lambda: ("x", m1))
    b2 = mentions._memoized_broadcast(
        spark, "bundle", scored_fingerprint(m2), lambda: ("x", m2))
    b3 = mentions._memoized_broadcast(
        spark, "bundle", scored_fingerprint(m3), lambda: ("x", m3))
    assert b1 is b2
    assert b3 is not b1


def test_lsh_banding_expr_matches_column_rendering(spark):
    """The expr-string band hashes equal the former Column-API rendering
    (xxhash64 over comma-joined casted band positions)."""
    n_hashes, bands = 8, 4
    rows = [(1, list(range(8))), (2, [7, 1, 2, 3, 9, 9, 9, 9])]
    sigs = spark.createDataFrame(rows, "id bigint, sig array<bigint>")
    rpb = n_hashes // bands
    col_api = sigs.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(
                ",", *[F.col("sig")[b * rpb + r].cast("string")
                       for r in range(rpb)]))
            for b in range(bands)
        ])).alias("band", "bucket"))
    got = dedup.lsh_candidate_pairs(sigs, bands=bands, n_hashes=n_hashes)
    # derive expected candidate pairs from the column-API banding
    a, b = col_api.alias("a"), col_api.alias("b")
    exp = (a.join(b, ["band", "bucket"])
           .filter(F.col("a.id") < F.col("b.id"))
           .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
           .distinct())
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in exp.collect()})


def test_dedup_pages_by_url_minby_ordering(spark):
    """The min_by winner election preserves the former window orderBy
    semantics exactly: earliest warc_ts wins, NULL ts loses to any
    non-null ts (asc_nulls_last), ties broken by smallest raw url."""
    import datetime as dt

    from geonames_rdf_spark.operators import urls
    t0 = dt.datetime(2020, 1, 1)
    t1 = dt.datetime(2020, 1, 2)
    rows = [
        ("https://a.example/x", None, b"null-ts"),
        ("https://a.example/x/", t1, b"later"),      # same canonical
        ("https://C.example/z", t1, b"later2"),
        ("https://c.example/z", t0, b"earliest"),    # same canonical
        ("https://b.example/y?b=1&a=2", t1, b"q1"),
        ("https://b.example/y?a=2&b=1", t1, b"q0"),  # tie: smaller url wins
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp,"
                                     " html binary")
    out = {r["url_canonical"]: (r["url"], bytes(r["html"]))
           for r in urls.dedup_pages_by_url(df).collect()}
    # NULL ts loses to a later non-null ts (asc_nulls_last)
    assert out["https://a.example/x"] == ("https://a.example/x/", b"later")
    # earliest ts wins regardless of raw-url order
    assert out["https://c.example/z"] == ("https://c.example/z", b"earliest")
    # equal ts: lexicographically smallest raw url wins
    assert out["https://b.example/y?a=2&b=1"] == (
        "https://b.example/y?a=2&b=1", b"q0")


def test_run_pipeline_pages_stage_schema_and_extraction(spark):
    """stages['pages'] still exposes the extracted-text corpus with the
    pre-r09 schema, and the fused-scan linked stage matches a scan over
    that extracted text."""
    r = materialize_stages(spark)
    pages = r["pages"]
    assert pages.columns == ["url", "warc_ts", "html", "lang", "text"]
    row = pages.orderBy("url").first()
    from geonames_rdf_spark.pipeline.extract import extract_text_py
    assert row["text"] == extract_text_py(bytes(row["html"]))
    r.unpersist()


def materialize_stages(spark):
    from geonames_rdf_spark.pipeline import materialize
    return materialize.run_pipeline(spark, SF, n_pages=60)
