"""End-to-end test of the curation job body (jobs/run_curate.run):
single-pass stage structure + persisted stage counters (VERDICT r06
#2/#7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF


def test_run_curate_job_stage_counters_and_single_pass(spark, tmp_path):
    from jobs.run_curate import build_arg_parser, run
    from geonames_rdf_spark.pipeline import lineage

    # documents + a url column (7 registered domains) so the domain cap
    # has something to do; a couple of shared lines so line dedup does too
    src = str(tmp_path / "docs_in")
    (spark.read.parquet(f"{SF}/documents.parquet")
     .withColumn("url", F.concat(
         F.lit("https://host"), (F.col("doc_id") % 7).cast("string"),
         F.lit(".org/p"), F.col("doc_id").cast("string")))
     .withColumn("text", F.concat(
         F.lit("SHARED COOKIE BANNER LINE\n"), F.col("text")))
     .write.mode("overwrite").parquet(src))

    out = str(tmp_path / "cur_out")
    args = build_arg_parser().parse_args([
        "--docs", src, "--out", out, "--min-quality", "0.2",
        "--max-per-domain", "40", "--dedup-lines", "8",
        "--chunk-tokens", "64", "--seq-len", "256"])

    # count the Spark jobs the run submits: with the capped corpus, the
    # line-dedup output and the kept set persisted, each expensive stage
    # runs once — a recompute regression (e.g. the old double-computed
    # line dedup) blows well past this bound
    sc = spark.sparkContext
    sc.setJobGroup("curate_job_test", "curate run", False)
    try:
        metrics = run(spark, args)
    finally:
        sc.setJobGroup(None, None, False)
    # 54 jobs measured on this pipeline shape (AQE splits queries into
    # several jobs each); re-computing a persisted stage — the old
    # double-run of line dedup, or the packer pre-flight re-deriving the
    # curation join — adds 15+ jobs, so a loose bound still catches it
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("curate_job_test"))
    assert n_jobs <= 70, f"curate run submitted {n_jobs} jobs"

    n_input = metrics["input_docs"]
    assert n_input == 500
    assert metrics["after_domain_cap"] == 7 * 40
    # every capped doc contains the shared banner line; all but the
    # globally-first occurrence are removed
    assert metrics["dedup_lines_removed"] >= metrics["after_domain_cap"] - 1
    assert 0 < metrics["curated_docs"] <= metrics["after_domain_cap"]
    assert metrics["n_chunks"] and metrics["n_packs"]
    assert metrics["oversized_packs"] == 0  # margin-1x composition

    # the counters are a run ARTIFACT (lineage stage_metrics table), not
    # just a stdout line — and they match the returned metrics exactly
    got = {r["metric"]: r["value"]
           for r in lineage.read_stage_counters(spark, out).collect()}
    assert got == {k: v for k, v in metrics.items()
                   if k != "mean_fill" and v is not None}

    # outputs landed
    assert spark.read.parquet(f"{out}/curated").count() \
        == metrics["curated_docs"]
    assert spark.read.parquet(f"{out}/packs").count() == metrics["n_chunks"]
