"""Sources round-trips + the P/R evaluation harness."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from geonames_rdf_spark import evaluation, synth
from geonames_rdf_spark.operators import build
from geonames_rdf_spark.pipeline import materialize
from geonames_rdf_spark.sources import ntriples, tsv
from tests.conftest import SF


def test_tsv_roundtrip_with_null_semantics(spark, tmp_path):
    gaz = synth.register_gazetteer(spark, SF)
    feats = gaz["features_plus"].withColumn("bestName", F.col("name"))
    path = str(tmp_path / "features_tsv")
    tsv.write_tsv(feats.select(*[f.name for f in tsv.FEATURES_SCHEMA.fields]), path)
    back = tsv.read_tsv(spark, path, tsv.FEATURES_SCHEMA)
    assert back.count() == feats.count()
    orig = feats.select(*[f.name for f in tsv.FEATURES_SCHEMA.fields])
    # '' and NULL collapse to NULL on read — normalize the original the same
    norm = orig
    for f in tsv.FEATURES_SCHEMA.fields:
        if f.dataType.typeName() == "string":
            norm = norm.withColumn(
                f.name, F.when(F.col(f.name) != "", F.col(f.name))
            )
    assert norm.exceptAll(back).count() == 0
    assert back.exceptAll(norm).count() == 0


def test_tsv_zip_source_matches_plain_read(spark, tmp_path):
    """GOLDEN: a zip archive of TSV members reads IDENTICAL to the plain
    TSV read (same schema casts, same ''==NULL collapse), including a
    bundled readme that must be skipped and per-member header rows."""
    import os
    import zipfile

    gaz = synth.register_gazetteer(spark, SF)
    feats = gaz["features_plus"].withColumn("bestName", F.col("name"))
    cols = [f.name for f in tsv.FEATURES_SCHEMA.fields]
    path = str(tmp_path / "features_tsv")
    tsv.write_tsv(feats.select(*cols), path)

    # pack the part files into TWO archives (parallelism unit = archive),
    # mimicking the per-country dumps: member .txt + a readme to ignore
    parts = sorted(p for p in os.listdir(path) if p.startswith("part-"))
    assert parts
    zips = str(tmp_path / "zips")
    os.makedirs(zips)
    half = (len(parts) + 1) // 2
    for zi, chunk in enumerate([parts[:half], parts[half:]]):
        if not chunk:
            continue
        with zipfile.ZipFile(f"{zips}/dump{zi}.zip", "w") as zf:
            for i, p in enumerate(chunk):
                with open(os.path.join(path, p), "rb") as fh:
                    zf.writestr(f"member{i}.txt", fh.read())
            zf.writestr("readme.txt.README", "do not parse me\tnot a row")

    plain = tsv.read_tsv(spark, path, tsv.FEATURES_SCHEMA)
    zipped = tsv.read_tsv_zip(spark, f"{zips}/*.zip", tsv.FEATURES_SCHEMA,
                              member_suffix=".txt")
    assert zipped.count() == plain.count() > 0
    assert plain.exceptAll(zipped).count() == 0
    assert zipped.exceptAll(plain).count() == 0

    # header=True drops the first line of each member
    with zipfile.ZipFile(f"{zips}/hdr.zip", "w") as zf:
        zf.writestr("h.txt", "geonameid\tname\n1\tAlpha\n2\t\n")
    from pyspark.sql import types as T

    two_cols = T.StructType([tsv.FEATURES_SCHEMA["geonameid"],
                             tsv.FEATURES_SCHEMA["name"]])
    hdr = tsv.read_tsv_zip(spark, f"{zips}/hdr.zip", two_cols,
                           header=True, member_suffix=".txt")
    rows = {r["geonameid"]: r["name"] for r in hdr.collect()}
    assert rows == {1: "Alpha", 2: None}


def test_ntriples_roundtrip(spark, tmp_path):
    kg = build.build_kg(spark, SF)
    path = str(tmp_path / "kg_nt")
    materialize.write_ntriples(kg, path)
    back = ntriples.read_ntriples(spark, path)
    assert back.count() == kg.count()
    a = kg.select("subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_dt")
    assert a.exceptAll(back).count() == 0
    assert back.exceptAll(a).count() == 0


def test_ntriples_roundtrip_adversarial_literals(spark, tmp_path):
    """Control chars, escape-collision sequences (backslash-n vs newline),
    and blank-node subjects/objects survive sink -> source exactly."""
    rows = [
        ("http://e/s1", "http://e/p", 'quote " here', False, None, None),
        ("http://e/s1", "http://e/p", "tab\there", False, "en", None),
        ("http://e/s1", "http://e/p", "multi\nline\rliteral", False, None, None),
        ("http://e/s1", "http://e/p", "backslash \\n not newline", False,
         None, "http://www.w3.org/2001/XMLSchema#string"),
        ("http://e/s1", "http://e/p", "\\", False, None, None),
        ("_:b0", "http://e/p", "_:b1", True, None, None),
        ("_:b1", "http://e/p", "http://e/o", True, None, None),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean,"
              " obj_lang string, obj_dt string")
    path = str(tmp_path / "adv_nt")
    materialize.write_ntriples(t, path)
    lines = {r["value"] for r in spark.read.text(path).collect()}
    assert '<http://e/s1> <http://e/p> "multi\\nline\\rliteral" .' in lines
    assert '_:b0 <http://e/p> _:b1 .' in lines
    back = ntriples.read_ntriples(spark, path)
    assert back.exceptAll(t).count() == 0
    assert t.exceptAll(back).count() == 0


def test_triple_pr_exact_match(spark):
    kg = build.build_kg(spark, SF)
    pr = evaluation.triple_pr(kg, kg)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0


def test_triple_pr_detects_divergence(spark):
    kg = build.build_kg(spark, SF)
    # drop consolidation => extra triples => precision < 1, recall = 1
    raw = build.build_kg(spark, SF, consolidate=False)
    pr = evaluation.triple_pr(raw, kg)
    assert pr["recall"] == 1.0
    assert pr["precision"] < 1.0


def test_versioned_catalog_snapshot_commit(spark, tmp_path):
    """Iceberg-style snapshot semantics on plain parquet: atomic pointer
    commit, reader isolation across a concurrent commit, time travel,
    and snapshot expiry."""
    from geonames_rdf_spark.sources import catalog

    path = str(tmp_path / "vtab")
    a = spark.range(10).withColumn("x", F.lit("a"))
    b = spark.range(20).withColumn("x", F.lit("b"))
    v1 = catalog.write_table_versioned(a, path)
    pinned = catalog.read_table_versioned(spark, path)  # resolves v1
    v2 = catalog.write_table_versioned(b, path)
    assert (v1, v2) == (1, 2)
    assert catalog.current_snapshot(path) == 2
    assert catalog.read_table_versioned(spark, path).count() == 20
    # isolation: the reader that resolved before the commit still sees v1
    assert pinned.count() == 10
    # time travel
    assert catalog.read_table_versioned(spark, path, snapshot=1).count() == 10
    assert catalog.table_snapshots(path) == [1, 2]
    # expiry retires old versions, never the current one
    catalog.write_table_versioned(a, path)
    assert catalog.expire_snapshots(path, keep=2) == [1]
    assert catalog.table_snapshots(path) == [2, 3]
    assert catalog.read_table_versioned(spark, path).count() == 10


def test_versioned_catalog_append_chain_and_occ(spark, tmp_path):
    """Iceberg append snapshots + optimistic-concurrency commits on the
    parquet emulation: an append commits ONLY its new rows but reads as
    the full chain; a second writer committing on the same base gets
    CommitConflict (at most one winner per base); expiry never deletes
    an ancestor a surviving append chain references."""
    import os

    import pytest as _pytest

    from geonames_rdf_spark.sources import catalog

    path = str(tmp_path / "vtab_app")
    v1 = catalog.write_table_versioned(
        spark.range(10).withColumn("x", F.lit("full")), path)
    v2 = catalog.write_table_versioned(
        spark.range(10, 15).withColumn("x", F.lit("ep1")), path,
        append=True)
    v3 = catalog.write_table_versioned(
        spark.range(15, 18).withColumn("x", F.lit("ep2")), path,
        append=True, base=v2)
    assert (v1, v2, v3) == (1, 2, 3)
    # full chain reads; each append dir holds ONLY its epoch's rows
    assert catalog.read_table_versioned(spark, path).count() == 18
    assert spark.read.parquet(os.path.join(path, "v=3")).count() == 3
    # time travel at an intermediate append snapshot
    assert catalog.read_table_versioned(spark, path, snapshot=2).count() == 15

    # OCC: a second commit on base v3 conflicts after the first wins
    catalog.write_table_versioned(
        spark.range(100, 101).withColumn("x", F.lit("w1")), path,
        append=True, base=v3)
    with _pytest.raises(catalog.CommitConflict):
        catalog.write_table_versioned(
            spark.range(200, 201).withColumn("x", F.lit("w2")), path,
            append=True, base=v3)
    assert catalog.read_table_versioned(spark, path).count() == 19

    # expiry: keep=1 would retire v1-v3 blindly, but v4's chain
    # references them — all stay; a full rewrite breaks the chain
    assert catalog.expire_snapshots(path, keep=1) == []
    assert catalog.table_snapshots(path) == [1, 2, 3, 4]
    catalog.write_table_versioned(
        spark.range(3).withColumn("x", F.lit("rewrite")), path)
    assert catalog.expire_snapshots(path, keep=1) == [1, 2, 3, 4]
    assert catalog.read_table_versioned(spark, path).count() == 3

    # appends never take partition columns (multi-root scans don't
    # share partition discovery)
    with _pytest.raises(ValueError, match="append"):
        catalog.write_table_versioned(
            spark.range(3).withColumn("x", F.lit("p")), path,
            partition_cols=("x",), append=True)

    # an append onto a missing base must raise (a silent full write
    # would commit a snapshot missing the table's history) and release
    # its claimed version dir
    before = catalog.table_snapshots(path)
    with _pytest.raises(ValueError, match="does not exist"):
        catalog.write_table_versioned(
            spark.range(3).withColumn("x", F.lit("q")), path,
            append=True, base=99)
    assert catalog.table_snapshots(path) == before


def test_versioned_catalog_chain_bound_and_crash_residue(spark, tmp_path):
    """r08 catalog hardening, three invariants:

    1. ``max_chain`` bounds append-chain read amplification: ~100
       appends under ``max_chain=8`` never resolve more than 8 parquet
       roots per read, rows and the epoch replay watermark survive
       every inline compaction, and intermediate chain links become
       expirable.
    2. A crashed writer's residue is a ``_staging_*`` dir only —
       invisible to readers/table_snapshots, never a dead ``v=N``
       claim that would CommitConflict every future commit on that
       base; ``expire_snapshots`` sweeps it.
    3. An EMPTY ``v=N`` dir (a dead claim left by the pre-r08 mkdir
       protocol) is silently reclaimed by the next commit on that
       base instead of conflicting forever.
    """
    import os

    from geonames_rdf_spark.sources import catalog

    path = str(tmp_path / "vtab_chain")
    catalog.write_table_versioned(
        spark.range(5).withColumn("x", F.lit("full")), path, epoch=0)
    n_appends = 100
    max_roots = 0
    for e in range(1, n_appends + 1):
        catalog.write_table_versioned(
            spark.range(1000 + e, 1001 + e).withColumn("x", F.lit("a")),
            path, append=True, epoch=e, max_chain=8)
        cur = catalog.current_snapshot(path)
        roots = 1 + len(catalog._parents_of(path, cur))
        max_roots = max(max_roots, roots)
        assert roots <= 8, (e, roots)
        assert catalog.last_committed_epoch(path) == e  # survives compaction
    assert max_roots == 8  # the bound is actually exercised
    assert catalog.read_table_versioned(spark, path).count() == 5 + n_appends
    # compaction broke the chain repeatedly: expiry can retire history
    assert len(catalog.expire_snapshots(path, keep=8)) > 80
    assert catalog.read_table_versioned(spark, path).count() == 5 + n_appends

    # (2) crashed writer residue: a staging dir neither blocks commits
    # nor shows up as a snapshot; expire sweeps it ONLY past the orphan
    # TTL (a fresh dir may be a live writer mid-write — r08 review)
    dead = os.path.join(path, catalog._STAGING_PREFIX + "dead")
    os.makedirs(os.path.join(dead, "part"), exist_ok=True)
    before = catalog.table_snapshots(path)
    assert before == catalog.table_snapshots(path)  # residue invisible
    base = catalog.current_snapshot(path)
    v = catalog.write_table_versioned(
        spark.range(1).withColumn("x", F.lit("after-crash")), path,
        append=True, base=base)
    assert v == base + 1
    catalog.expire_snapshots(path, keep=10_000)
    assert os.path.isdir(dead)  # fresh: inside the live-writer window
    stale = time.time() - 7200
    os.utime(dead, (stale, stale))
    catalog.expire_snapshots(path, keep=10_000)
    assert not os.path.isdir(dead)  # past the TTL: swept

    # (3) dead EMPTY claim on the next version: reclaimed, not fatal
    cur = catalog.current_snapshot(path)
    os.mkdir(os.path.join(path, f"v={cur + 1}"))
    v2 = catalog.write_table_versioned(
        spark.range(1).withColumn("x", F.lit("reclaim")), path,
        append=True, base=cur)
    assert v2 == cur + 1
    assert catalog.read_table_versioned(
        spark, path, snapshot=v2).count() == 5 + n_appends + 2


def test_versioned_catalog_concurrent_writer_contention(spark, tmp_path):
    """LIVE contention on the r08 rename protocol: 6 writers race
    optimistic commits on the same evolving table.  Invariants — each
    base admits exactly ONE winner (losers get CommitConflict and
    retry on the new current), every writer eventually lands exactly
    one snapshot, no snapshot interleaves rows from two writers, the
    pointer ends at the newest version, and the final chain reads as
    the union of all writers' rows."""
    from concurrent.futures import ThreadPoolExecutor

    from geonames_rdf_spark.sources import catalog

    path = str(tmp_path / "vtab_race")
    catalog.write_table_versioned(
        spark.range(1).withColumn("w", F.lit(-1)), path)

    n_writers, conflicts = 6, []

    def writer(w: int) -> int:
        df = (spark.range(w * 100, w * 100 + 10)
              .withColumn("w", F.lit(w)))
        while True:
            base = catalog.current_snapshot(path)
            try:
                return catalog.write_table_versioned(
                    df, path, append=True, base=base)
            except catalog.CommitConflict:
                conflicts.append(w)  # list.append is thread-safe

    with ThreadPoolExecutor(max_workers=n_writers) as pool:
        versions = list(pool.map(writer, range(n_writers)))

    # one snapshot per writer, all distinct, pointer at the newest
    assert sorted(versions) == list(range(2, 2 + n_writers))
    assert catalog.current_snapshot(path) == 1 + n_writers
    # no interleaving: each committed version dir holds ONE writer's
    # rows exactly (the claim-release window would mix two writers)
    import os as _os

    for v, w in zip(versions, range(n_writers)):
        got = spark.read.parquet(_os.path.join(path, f"v={v}")).collect()
        assert len(got) == 10 and {r["w"] for r in got} == {w}
    # the final chain is the union of everything
    final = catalog.read_table_versioned(spark, path)
    assert final.count() == 1 + 10 * n_writers
    assert final.groupBy("w").count().count() == n_writers + 1
    # contention actually happened (6 threads, serialized bases)
    assert conflicts, "race never contended — test too weak"


def test_commit_pointer_raises_on_retry_exhaustion(tmp_path, monkeypatch):
    """A pointer that keeps regressing (external rewriter) must raise
    after the retries, not silently strand the committed snapshot
    behind a stale "current" (VERDICT r07 #5)."""
    import pytest as _pytest

    from geonames_rdf_spark.sources import catalog

    path = str(tmp_path / "vtab_ptr")
    import os

    os.makedirs(path)
    monkeypatch.setattr(catalog, "current_snapshot", lambda p: 0)
    with _pytest.raises(RuntimeError, match="_CURRENT pointer"):
        catalog._commit_pointer(path, 1)


def test_warc_roundtrip_and_pipeline_ingest(spark, tmp_path):
    """Common-Crawl-shaped ingestion: pages written as .warc.gz archives
    read back byte-identical (url, ts, html), and the fused KG pipeline
    over the WARC-sourced table emits EXACTLY the links of the parquet
    path — the format swap is invisible to the engine."""
    from geonames_rdf_spark.operators import build
    from geonames_rdf_spark.pipeline import corpus, mentions
    from geonames_rdf_spark.sources import warc

    tables = build.gazetteer_tables(spark, SF)
    feats = tables["features"]
    surfaces = corpus.gazetteer_surfaces(feats)
    pages = corpus.synthesize_pages(spark, surfaces, 80).repartition(3)

    wdir = str(tmp_path / "warcs")
    warc.write_warc(pages, wdir)
    import os

    names = sorted(os.listdir(wdir))
    assert names and all(n.endswith(".warc.gz") for n in names)

    back = warc.read_warc(spark, f"{wdir}/*.warc.gz")
    assert back.count() == pages.count()
    # byte-identity of html + timestamp survival, keyed by url
    orig = {r["url"]: (bytes(r["html"]), r["warc_ts"])
            for r in pages.select("url", "html", "warc_ts").collect()}
    for r in back.collect():
        oh, ots = orig[r["url"]]
        assert bytes(r["html"]) == oh
        assert abs((r["warc_ts"] - ots).total_seconds()) < 1  # s precision

    # pipeline ingest: WARC source + lang joined from crawl metadata
    smap = mentions.build_scored_surface_map(feats)
    warc_pages = back.join(pages.select("url", "lang"), "url")
    a = mentions.detect_and_link(warc_pages, smap, from_html=True)
    b = mentions.detect_and_link(pages, smap, from_html=True)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
