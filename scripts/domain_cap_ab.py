#!/usr/bin/env python3
"""Measured A/B for cap_per_domain's routing (r06).

DESIGN.md's skew corollary: every skew mechanism needs a *measured*
A/B, not just a correctness test.  This builds a pathological corpus —
one mega-domain holding most rows (the Zipf head the cap controls)
plus a genuine multi-domain tail — and times the cap's two over-cap
routes on the SAME input:

  window = one rank-only window per over-cap domain (the default route
           below window_max_rows: streamed spillable sort, but ONE
           reducer owns the whole mega-domain), vs
  salted = the threshold route (window_max_rows=0: per-(domain, salt)
           parallel ranking + exact-threshold broadcast compare; ~3
           extra scans/shuffles of fixed cost)

checking the kept sets are identical.  The measured crossover is the
basis for DEFAULT_WINDOW_MAX_ROWS = 10M: on this host the window
route wins at a 5M-row hot domain (13.4 s vs 18.0 s — the salted
path's ~3 extra fixed scans dominate) and LOSES 2.6x at 20M (103.5 s
vs 39.0 s — the single reducer's sort now dominates), so the default
bound sits inside the measured band and a 10^9-row host routes to the
path that scales.  Prints ONE JSON line.  Run on a QUIET host
(BENCH.md methodology); uptime included so load contamination is
visible.

    python3 scripts/domain_cap_ab.py [hot_rows] [tail_domains] [salt]

r07 adds the broadcast-routing A/B (VERDICT r06 #1): a corpus whose
over-cap set is LARGE BY DOMAIN COUNT (millions of distinct over-cap
domains — the shape that makes a forced broadcast of the set a driver
killer at web scale), timing the broadcast-hinted joins against the
unhinted shuffle fallback cap_per_domain routes to above
``broadcast_max_domains``.  Same interleaved best-of-2 methodology.

    python3 scripts/domain_cap_ab.py --broadcast-ab [over_domains] [rows_per]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geonames_rdf_spark.operators import domains  # noqa: E402
from geonames_rdf_spark.session import get_spark  # noqa: E402

CAP = 1000


def broadcast_ab() -> None:
    """Time the over-cap-set joins with the broadcast hint vs the
    unhinted shuffle fallback, on a corpus with a huge over-cap set BY
    DOMAIN COUNT (every domain 1 row over a cap of rows_per - 1)."""
    over_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    rows_per = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cap = rows_per - 1
    spark = get_spark(app_name="domain_cap_broadcast_ab")

    # distinct REGISTERED domains (2-label hosts): over-N.org, not
    # subdomains of one registrable suffix
    pages = spark.range(over_domains * rows_per).select(
        F.concat(F.lit("https://over-"),
                 (F.col("id") % over_domains).cast("string"),
                 F.lit(".org/p"), F.col("id").cast("string"))
        .alias("url"),
        F.col("id").alias("ord"))
    pages.write.mode("overwrite").parquet("/tmp/domain_cap_bcast_in")
    pages = spark.read.parquet("/tmp/domain_cap_bcast_in")
    pages.count()  # warm footers + JIT outside the measured region

    def run(bound: int):
        t0 = time.time()
        out = domains.cap_per_domain(pages, cap, url_col="url",
                                     order_col="ord",
                                     broadcast_max_domains=bound)
        n = out.filter("domain_kept").count()
        return round(time.time() - t0, 3), n

    bcast, shuf = [], []
    for _ in range(2):  # interleaved best-of-2 (house methodology)
        bcast.append(run(1 << 62))  # hint always fires
        shuf.append(run(0))         # hint never fires -> shuffle joins
    t_b, n_b = min(bcast)
    t_s, n_s = min(shuf)
    print(json.dumps({
        "mode": "broadcast_ab", "over_domains": over_domains,
        "rows_per_domain": rows_per, "cap": cap,
        "kept_broadcast": n_b, "kept_shuffle": n_s,
        "kept_equal": n_b == n_s,
        "t_broadcast_hint_s": t_b, "t_shuffle_fallback_s": t_s,
        "broadcast_max_domains_default":
            domains.DEFAULT_BROADCAST_MAX_DOMAINS,
        "uptime": os.popen("uptime").read().strip(),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--broadcast-ab":
        broadcast_ab()
        return
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    tail = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark(app_name="domain_cap_ab")

    # hot: one registered domain, subdomain-sprayed; tail: `tail`
    # DISTINCT registered domains, 5 rows each (all under cap)
    pages = (spark.range(hot).select(
        F.concat(F.lit("https://s"), (F.col("id") % 97).cast("string"),
                 F.lit(".mega-site.com/p"), F.col("id").cast("string"))
        .alias("url"),
        F.col("id").alias("ord"))
        .unionByName(spark.range(tail * 5).select(
            F.concat(F.lit("https://tail-"),
                     (F.col("id") % tail).cast("string"),
                     F.lit(".org/p"), F.col("id").cast("string"))
            .alias("url"),
            (F.col("id") + hot).alias("ord"))))
    pages.write.mode("overwrite").parquet("/tmp/domain_cap_ab_in")
    pages = spark.read.parquet("/tmp/domain_cap_ab_in")
    pages.count()  # warm footers + JIT outside the measured region

    def run(window_max_rows: int):
        t0 = time.time()
        out = domains.cap_per_domain(pages, CAP, url_col="url",
                                     order_col="ord", salt=salt,
                                     window_max_rows=window_max_rows)
        n = out.filter("domain_kept").count()
        return round(time.time() - t0, 3), n, out

    # interleaved best-of-2 per route (house methodology): the first
    # plan executed pays JIT + cold page cache for both, so a single
    # ordered pass biases whichever route runs first
    wins, salts = [], []
    for _ in range(2):
        wins.append(run(1 << 62))   # everything via the window
        salts.append(run(0))        # everything via the threshold
    t_win, n_win, out_win = min(wins, key=lambda r: r[0])
    t_salt, n_salt, out_salt = min(salts, key=lambda r: r[0])

    diff = (out_win.filter("domain_kept").select("url")
            .exceptAll(out_salt.filter("domain_kept").select("url"))
            .count())

    print(json.dumps({
        "hot_rows": hot, "tail_domains": tail, "tail_rows": tail * 5,
        "cap": CAP, "salt": salt,
        "kept_window": n_win, "kept_salted": n_salt,
        "kept_sets_equal": diff == 0 and n_win == n_salt,
        "t_window_route_s": t_win,
        "t_salted_route_s": t_salt,
        "window_max_rows_default": domains.DEFAULT_WINDOW_MAX_ROWS,
        "uptime": os.popen("uptime").read().strip(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
