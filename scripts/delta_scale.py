#!/usr/bin/env python3
"""Measured evidence for the scoped-changelog ∝-change-size claim
(VERDICT r05 next-round #8): at a replicated (x16) world, compare the
wall-time of

  full   = triple_changelog(build(old), build(new))   (two FULL builds
           + two world-scale exceptAlls), vs
  scoped = scoped_changelog(...)                      (input diff ->
           affected-id superset -> builds pre-filtered to it)

for a NARROW one-entity dump refresh (one P-row population bump).
Prints ONE JSON line.  Run on a QUIET host (BENCH.md methodology);
uptime is included so load contamination is visible.

    python3 scripts/delta_scale.py [replicate]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geonames_rdf_spark.operators import build  # noqa: E402
from geonames_rdf_spark.pipeline import delta  # noqa: E402
from geonames_rdf_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="delta_scale")

    tables_old = build.gazetteer_tables(spark, SF, replicate=replicate)
    # narrow refresh: ONE populated place's population bumps (id 117 is
    # a P row in every replica-0 world; %23/%6 exclusions don't hit it)
    target = 117
    mutated = tables_old["features"].withColumn(
        "population",
        F.when(F.col("geonameid") == target, F.col("population") + 1)
        .otherwise(F.col("population")))
    tables_new = dict(tables_old)
    tables_new["features"] = mutated

    t0 = time.time()
    old_kg = build.build_kg(spark, SF, tables=tables_old,
                            include_ontology=False)
    new_kg = build.build_kg(spark, SF, tables=tables_new,
                            include_ontology=False)
    full = delta.triple_changelog(old_kg, new_kg)
    n_full = full.count()
    t_full = time.time() - t0

    t0 = time.time()
    scoped = delta.scoped_changelog(spark, SF, tables_old, tables_new)
    n_scoped = scoped.count()
    t_scoped = time.time() - t0

    world = old_kg.count()
    print(json.dumps({
        "replicate": replicate,
        "world_triples": world,
        "changelog_rows": n_full,
        "scoped_rows": n_scoped,
        "rows_match": n_full == n_scoped,
        "t_full_s": round(t_full, 3),
        "t_scoped_s": round(t_scoped, 3),
        "speedup": round(t_full / t_scoped, 2) if t_scoped else None,
        "uptime": os.popen("uptime").read().strip(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
