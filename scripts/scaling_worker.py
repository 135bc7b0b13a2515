#!/usr/bin/env python3
"""One scaling-run datapoint: fixed workload at a given core count.

Usage: scaling_worker.py <cpus> <n_pages> [sf_dir] — prints one JSON line
{"cpus": N, "kg_sec": ..., "pipe_sec": ..., "triples": ..., "pages": ...}.
Run in its own process so each datapoint gets a fresh JVM with exactly
local[N].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geonames_rdf_spark.operators import build  # noqa: E402
from geonames_rdf_spark.pipeline import materialize  # noqa: E402
from geonames_rdf_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    # warm JVM/parquet (excluded from the measurement)
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    build.build_kg(spark, sf_dir).limit(1).count()

    def best_of(fn, n=3):
        """min wall time over n reps — immunises each metric against the
        shared host's load spikes (one quiet window suffices)."""
        best, result = None, None
        for _ in range(n):
            t0 = time.time()
            result = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, result

    kg_sec, triples = best_of(lambda: build.build_kg(spark, sf_dir).count())
    # scaled KG build: x16 replicated places so the melt+joins dominate
    # the ~3s fixed planning/broadcast cost that swamps the sf0.1 build
    kg_big_sec, triples_big = best_of(
        lambda: build.build_kg(spark, sf_dir, replicate=16).count()
    )

    # prep: dimension build + driver collects — fixed cost independent of
    # corpus size (amortized away at scale); timed separately
    from geonames_rdf_spark.pipeline import corpus, extract, link, mentions
    from pyspark.sql import functions as F

    t0 = time.time()
    tables = build.gazetteer_tables(spark, sf_dir)
    feats = tables["features"].cache()
    feats.count()
    surfaces = corpus.gazetteer_surfaces(feats)
    smap = mentions.build_surface_map(feats)
    prep_sec = time.time() - t0

    def pages_df():
        return extract.with_extracted_text(
            corpus.synthesize_pages(spark, surfaces, n_pages)
            .drop("text").withColumn("text", F.lit(None).cast("string"))
        )

    # scan-only phase: synth -> extract -> AC scan (zero shuffles)
    scan_sec, n_mentions = best_of(
        lambda: mentions.detect_mentions(pages_df(), smap, carry_lang=True).count()
    )

    # full phase: + link argmax + mention-triple dedup (two shuffles)
    def full():
        ment = mentions.detect_mentions(pages_df(), smap, carry_lang=True)
        linked = link.link_mentions(ment, feats)
        return materialize.mention_triples(linked).count()

    pipe_sec, mention_triples = best_of(full)

    print(json.dumps({
        "cpus": cpus, "kg_sec": round(kg_sec, 3),
        "kg_big_sec": round(kg_big_sec, 3), "triples_big": triples_big,
        "prep_sec": round(prep_sec, 3),
        "scan_sec": round(scan_sec, 3), "pipe_sec": round(pipe_sec, 3),
        "triples": triples, "n_mentions": n_mentions,
        "mention_triples": mention_triples, "pages": n_pages,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
