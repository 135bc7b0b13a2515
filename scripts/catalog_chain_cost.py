#!/usr/bin/env python3
"""Measured read-amplification curve for catalog append chains (r08).

VERDICT r07 #8: a reader of snapshot N resolves one parquet root per
chain link, so unbounded appends mean unbounded scan fan-out.  This
probes it directly: build one table with UNBOUNDED appends
(max_chain=None) and one with the bounded default policy, appending the
same batches to both, and time a full read of the current snapshot at
checkpoints along the way (best-of-2 per point; rows identical across
policies at every point).  Prints ONE JSON line.

    python3 scripts/catalog_chain_cost.py [n_appends] [rows_per] [max_chain]

Run on a QUIET host (BENCH.md methodology); uptime is included so load
contamination is visible.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

from geonames_rdf_spark.session import get_spark  # noqa: E402
from geonames_rdf_spark.sources import catalog  # noqa: E402


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    max_chain = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    spark = get_spark(app_name="catalog_chain_cost", master="local[8]")
    from pyspark.sql import functions as F

    unbounded = tempfile.mkdtemp(prefix="chain_unbounded_")
    bounded = tempfile.mkdtemp(prefix="chain_bounded_")
    for path in (unbounded, bounded):
        catalog.write_table_versioned(
            spark.range(rows_per).withColumn("x", F.lit("full")), path,
            epoch=0)

    def read_s(path: str) -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            catalog.read_table_versioned(spark, path).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    points = []
    checkpoints = {1, 8, 16, 32, 64, n_appends}
    for e in range(1, n_appends + 1):
        batch = spark.range(e * rows_per, (e + 1) * rows_per) \
            .withColumn("x", F.lit("a"))
        catalog.write_table_versioned(batch, unbounded, append=True,
                                      epoch=e, max_chain=None)
        catalog.write_table_versioned(batch, bounded, append=True,
                                      epoch=e, max_chain=max_chain)
        if e in checkpoints:
            cu = catalog.current_snapshot(unbounded)
            cb = catalog.current_snapshot(bounded)
            ru = catalog.read_table_versioned(spark, unbounded).count()
            rb = catalog.read_table_versioned(spark, bounded).count()
            assert ru == rb == (e + 1) * rows_per, (e, ru, rb)
            points.append({
                "appends": e,
                "roots_unbounded": 1 + len(catalog._parents_of(unbounded, cu)),
                "roots_bounded": 1 + len(catalog._parents_of(bounded, cb)),
                "read_s_unbounded": read_s(unbounded),
                "read_s_bounded": read_s(bounded),
            })
    up = subprocess.run(["uptime"], capture_output=True,
                        text=True).stdout.strip()
    print(json.dumps({
        "mode": "catalog_chain_cost", "rows_per_append": rows_per,
        "max_chain": max_chain, "points": points, "uptime": up,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
