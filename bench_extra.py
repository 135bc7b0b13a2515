#!/usr/bin/env python3
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the driver bench — ``bench.py`` stays frozen.  This file:

* times PLAN CONSTRUCTION (python DataFrame assembly + analysis) apart
  from EXECUTION (same action as bench.py: ``count()``), per query;
* offers ``--noop`` to time full-column compute via the noop sink
  (guide §1.4) instead of count;
* labels every job (``setJobDescription``) so any UI/event-log reading
  maps back to the query;
* ``--explain <dir>`` dumps ``explain('formatted')`` per query (the
  plans/r09/ evidence files);
* ``--phases`` adds sub-phase probes (kg build stages, pipeline stages)
  that the suite-level numbers cannot separate.

Usage:  python bench_extra.py [--reps N] [--only a,b] [--noop]
                              [--explain plans/r09 --tag before]
                              [--phases]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geonames_rdf_spark import oracle  # noqa: E402
from geonames_rdf_spark.operators import build, dedup, similarity  # noqa: E402
from geonames_rdf_spark.pipeline import materialize  # noqa: E402
from geonames_rdf_spark.plans import workload  # noqa: E402
from geonames_rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PAGES = int(os.environ.get("BENCH_PAGES", "20000"))


def main() -> None:
    import shutil
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", type=str, default="")
    ap.add_argument("--tag", type=str, default="before")
    ap.add_argument("--phases", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="bench_extra")
    sc = spark.sparkContext
    spark.read.parquet(f"{SF_DIR}/customer.parquet").count()

    kg_dir = tempfile.mkdtemp(prefix="bx_kg_")
    build.build_kg(spark, SF_DIR).write.mode("overwrite").parquet(kg_dir)
    kg = spark.read.parquet(kg_dir)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def pipeline_run():
        r = materialize.run_pipeline(spark, SF_DIR, n_pages=N_PAGES,
                                     include_feature_triples=False)
        return r["triples"]

    def dedup_lines_df():
        from pyspark.sql import functions as F

        from geonames_rdf_spark.operators import lines as L

        grouped = (docs.groupBy((F.col("doc_id") % 100).alias("_g"))
                   .agg(F.concat(
                       F.lit("COOKIE BANNER ACCEPT ALL\n"),
                       F.array_join(
                           F.transform(
                               F.array_sort(F.collect_list(
                                   F.struct("doc_id", "text"))),
                               lambda s: s.text), "\n"),
                       F.lit("\nCC-LICENSE FOOTER v1")).alias("text"))
                   .select(F.col("_g").alias("doc_id"), "text"))
        return L.dedup_lines(grouped, min_chars=2)

    suite = {
        "kg_full_build": lambda: build.build_kg(spark, SF_DIR),
        "web_pipeline": pipeline_run,
        "c4_descendants": lambda: workload.q_descendants(kg, oracle.SEED_ADM1),
        "c8_hierarchy_report":
            lambda: workload.q_hierarchy_report(kg, oracle.SEED_PLACE),
        "c9_museums_knn": lambda: workload.q_museums(kg, oracle.SEED_CITY),
        "c2_population_topk": lambda: workload.q_population(kg),
        "dedup_minhash_lsh":
            lambda: dedup.minhash_near_dups(docs, threshold=0.5),
        "dedup_lines": dedup_lines_df,
        "ann_knn_per_label":
            lambda: similarity.pairwise_topk_per_label_blas(emb, k=3),
    }

    if args.phases:
        def kg_wide():
            t = build.gazetteer_tables(spark, SF_DIR)
            import geonames_rdf_spark.operators.places as places
            return places.feature_entities(
                t["features"], t["country_codes"], t["admin_lookups"],
                t["hierarchy"])

        def kg_melt_only():
            return build.build_kg(spark, SF_DIR, include_docs=True,
                                  include_alt=False, include_ags=False,
                                  include_ontology=False)

        def kg_alt_only():
            from geonames_rdf_spark.operators import altnames
            t = build.gazetteer_tables(spark, SF_DIR)
            return altnames.alt_name_triples(t["alt_names"])

        def pages_only():
            from pyspark.sql import functions as F

            from geonames_rdf_spark.pipeline import corpus, extract
            feats = build.gazetteer_tables(spark, SF_DIR)["features"]
            surfaces = corpus.gazetteer_surfaces(feats)
            pages = corpus.synthesize_pages(spark, surfaces, N_PAGES)
            return extract.with_extracted_text(
                pages.drop("text").withColumn(
                    "text", F.lit(None).cast("string")))

        def pages_raw():
            from geonames_rdf_spark.pipeline import corpus
            feats = build.gazetteer_tables(spark, SF_DIR)["features"]
            surfaces = corpus.gazetteer_surfaces(feats)
            return corpus.synthesize_pages(spark, surfaces, N_PAGES)

        def link_only():
            from geonames_rdf_spark.pipeline import corpus, mentions
            feats = build.gazetteer_tables(spark, SF_DIR)["features"]
            surfaces = corpus.gazetteer_surfaces(feats)
            pages = corpus.synthesize_pages(spark, surfaces, N_PAGES)
            smap = mentions.build_scored_surface_map(feats)
            return mentions.detect_and_link(pages, smap, from_html=True)

        def minhash_sigs():
            return dedup.minhash_signatures(docs)

        def minhash_pairs():
            sigs = dedup.minhash_signatures(docs).localCheckpoint(eager=False)
            m, vsigs = dedup.collapse_identical_signatures(sigs)
            return dedup.lsh_candidate_pairs(vsigs)

        suite.update({
            "ph_kg_wide": kg_wide,
            "ph_kg_melt_only": kg_melt_only,
            "ph_kg_alt_only": kg_alt_only,
            "ph_pages_extracted": pages_only,
            "ph_pages_raw": pages_raw,
            "ph_link_only": link_only,
            "ph_minhash_sigs": minhash_sigs,
            "ph_minhash_pairs": minhash_pairs,
        })

    only = [s for s in args.only.split(",") if s]
    out: dict = {"sf": SF_DIR, "noop": bool(args.noop), "reps": args.reps,
                 "plan_s": {}, "exec_s": {}, "rows": {},
                 "loadavg_1m": round(os.getloadavg()[0], 2)}
    for name, fn in suite.items():
        if only and name not in only:
            continue
        plan_t, exec_t, rows = [], [], None
        for _ in range(args.reps):
            sc.setJobDescription(f"bx:{name}")
            t0 = time.time()
            df = fn()
            plan_t.append(time.time() - t0)
            t0 = time.time()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                rows = df.count()
            exec_t.append(time.time() - t0)
            sc.setJobDescription(None)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            path = os.path.join(args.explain, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(suite_explain(fn()))
        out["plan_s"][name] = round(min(plan_t), 3)
        out["exec_s"][name] = round(min(exec_t), 3)
        if rows is not None:
            out["rows"][name] = rows
    print(json.dumps(out))
    shutil.rmtree(kg_dir, ignore_errors=True)
    spark.stop()


def suite_explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


if __name__ == "__main__":
    main()
