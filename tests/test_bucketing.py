"""Bucketed co-located join: the shuffle-elimination pattern for repeated
big-big joins on the same key (SURVEY.md §4, 'bucketing for co-located
joins').  Both sides bucketed+sorted on the join key at write time => the
join plan has NO Exchange on either side."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_bucketed_join_is_exchange_free(spark):
    # clear any stale managed-table locations from aborted runs
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    left = spark.range(100000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(100000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("b")
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
           .saveAsTable(name))

    # hint("merge"): at demo size the 64m broadcast threshold would pick
    # BHJ; the pattern under test is big-big SMJ without exchanges
    j = spark.table("bkt_left").hint("merge").join(spark.table("bkt_right"), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: zero shuffles
    assert j.count() == 100000

    # contrast: the same join on unbucketed parquet shuffles both sides
    un = left.hint("merge").join(right, "k")
    un_plan = un._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in un_plan

    for name in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
