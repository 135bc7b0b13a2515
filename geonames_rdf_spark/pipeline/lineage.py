"""Per-partition lineage + exact resume (stage S7, north_rule).

The corpus is partitioned by ``pmod(xxhash64(url), N)`` buckets.  Each run
writes triples under ``out/triples/bucket=K/`` (dynamic partition
overwrite — idempotent per bucket) and appends a lineage row
(bucket, n_pages, n_mentions, n_triples, status) to ``out/lineage/``.
Resume = read the lineage table, skip buckets already 'done', process the
rest; a re-run after a crash converges to the same triple set because
bucket overwrite is idempotent.

Iceberg would give the same semantics with snapshot isolation
(``replaceWhere``-style); the jar is not in this container, so the
partitioned-parquet layout stands in behind the same API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "bucket int, n_pages bigint, n_mentions bigint, n_triples bigint, status string"
)


def done_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    path = f"{out_dir}/lineage"
    if not os.path.exists(path):
        return set()
    rows = (
        spark.read.schema(LINEAGE_SCHEMA).parquet(path)
        .filter(F.col("status") == "done").select("bucket").distinct().collect()
    )
    return {r["bucket"] for r in rows}


def run_with_lineage(
    spark: SparkSession,
    pages: DataFrame,
    triples_for: "callable",
    out_dir: str,
    n_buckets: int = 8,
    fail_after: int | None = None,
) -> None:
    """Process bucket-by-bucket with resume.

    ``triples_for(pages_subset) -> DataFrame`` produces the triples of a
    page subset.  ``fail_after`` aborts after that many buckets (test hook
    simulating a crash mid-run).  Already-done buckets are skipped.
    """
    from pyspark.sql import Observation

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    pages_b = pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).cache()
    done = done_buckets(spark, out_dir)
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated crash before bucket {b}")
        # ONE job per bucket: page/triple counts ride the write itself as
        # observe() metrics instead of a pre-count plus a re-read count
        obs_pages = Observation(f"lineage_pages_{b}")
        obs_triples = Observation(f"lineage_triples_{b}")
        subset = pages_b.filter(F.col("bucket") == b).observe(
            obs_pages, F.count(F.lit(1)).alias("n"))
        t = triples_for(subset.drop("bucket")).withColumn("bucket", F.lit(b))
        t = t.observe(obs_triples, F.count(F.lit(1)).alias("n"))
        t.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{out_dir}/triples"
        )
        row = spark.createDataFrame(
            [(b, obs_pages.get["n"], None, obs_triples.get["n"], "done")],
            LINEAGE_SCHEMA,
        )
        row.write.mode("append").parquet(f"{out_dir}/lineage")
        processed += 1
    pages_b.unpersist()


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/triples").drop("bucket")
