#!/usr/bin/env python3
"""Headline benchmark: prints ONE JSON line with per-query seconds.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Queries cover the engine's main cost centres:
the full KG build (triples/sec headline), the web pipeline (extraction +
AC mentions + linking), closure/star/kNN workload queries, and the
training-data operators (minhash dedup, embedding kNN).
"""

from __future__ import annotations

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
    spark = get_spark(app_name="bench")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    reps = int(os.environ.get("BENCH_REPS", "2"))

    def timed(name, fn):
        # best-of-N: this host carries bursty external load (load-avg
        # 3-11 from outside the container); min wall time is the engine
        best = None
        for _ in range(reps):
            t0 = time.time()
            counts[name] = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # warm the JVM + parquet footers once (not counted)
    spark.read.parquet(f"{SF_DIR}/customer.parquet").count()

    timed("kg_full_build", lambda: build.build_kg(spark, SF_DIR).count())

    def pipeline_run():
        r = materialize.run_pipeline(spark, SF_DIR, n_pages=N_PAGES,
                                     include_feature_triples=False)
        return r["triples"].count()

    timed("web_pipeline", pipeline_run)

    kg = build.build_kg(spark, SF_DIR).cache()
    kg.count()
    timed("c4_descendants",
          lambda: workload.q_descendants(kg, oracle.SEED_ADM1).count())
    timed("c8_hierarchy_report",
          lambda: workload.q_hierarchy_report(kg, oracle.SEED_PLACE).count())
    timed("c9_museums_knn",
          lambda: workload.q_museums(kg, oracle.SEED_CITY).count())
    timed("c2_population_topk",
          lambda: workload.q_population(kg).count())
    kg.unpersist()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("dedup_minhash_lsh",
          lambda: dedup.minhash_near_dups(docs, threshold=0.5).count())
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed("ann_knn_per_label",
          lambda: similarity.pairwise_topk_per_label(emb, k=3).count())

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "rows": counts,
        "triples_per_sec": round(counts["kg_full_build"] / timings["kg_full_build"]),
        "pages_per_sec": round(N_PAGES / timings["web_pipeline"]),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
