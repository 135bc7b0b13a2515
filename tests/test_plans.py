"""Physical-plan audits: the plans the engine MUST produce at scale.

These lock in the scale-critical properties — dimension joins broadcast
(never sort-merge), predicate pushdown reaching the parquet scan, top-k as
TakeOrderedAndProject (no global sort) — so a regression that silently
degrades the 100 TB plan fails CI, not production.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geonames_rdf_spark.operators import build
from geonames_rdf_spark.plans import workload
from tests.conftest import SF


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kg_build_all_joins_broadcast(spark):
    plan = plan_of(build.build_kg(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_triple_scan_predicate_pushdown(spark, tmp_path):
    path = str(tmp_path / "triples_parquet")
    build.build_kg(spark, SF).write.parquet(path)
    t = spark.read.parquet(path)
    q = t.filter(F.col("pred") == "http://www.geonames.org/ontology#name") \
         .select("subj", "obj")
    plan = plan_of(q)
    assert "PushedFilters: [" in plan and "pred" in plan.split("PushedFilters")[1][:200]
    # column pruning: html-sized columns are absent from ReadSchema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "obj_lang" not in read_schema


def test_topk_uses_take_ordered(spark):
    kg = build.build_kg(spark, SF)
    plan = plan_of(workload.q_population(kg, limit=100))
    assert "TakeOrderedAndProject" in plan


def test_entity_table_single_shuffle(spark, tmp_path):
    path = str(tmp_path / "triples_parquet2")
    build.build_kg(spark, SF).write.parquet(path)
    t = spark.read.parquet(path)
    e = workload.entity_table(t, {"name": "http://www.geonames.org/ontology#name",
                                  "pop": "http://www.geonames.org/ontology#population"})
    plan = plan_of(e)
    # one hash-aggregate pair around exactly one exchange — the star join
    # never becomes N self-joins
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_code_labels_in_kg_broadcasts_label_side(spark):
    """C12 self-join: the concept-label slice must broadcast — a
    sort-merge here would shuffle every featureCode row at corpus scale."""
    kg = build.build_kg(spark, SF)
    plan = plan_of(workload.q_code_labels_in_kg(kg))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_stored_index_partition_pruning(spark, tmp_path):
    """The stored IVF index is partitioned by _cell and a probe PRUNES to
    the nprobe partitions — at 10^12 vectors this is the difference
    between a metadata lookup and a full corpus scan."""
    from geonames_rdf_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = similarity.fixed_centroids(k=8, dim=len(
        emb.select("embedding").first()["embedding"]))
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(emb, cents, path)
    q = [0.1] * len(cents[0])
    probed = similarity.ann_ivf_topk_stored(spark, path, q, cents, nprobe=2)
    plan = plan_of(probed)
    # the _cell predicate must be a PARTITION filter (metadata), not a
    # pushed data filter
    part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "_cell" in part
    # correctness of the stored path: same result as the inline probe
    inline = similarity.ann_ivf_topk(emb, q, centroids=cents, nprobe=2)
    assert [r.asDict() for r in probed.collect()] == \
        [r.asDict() for r in inline.collect()]
    # functional pruning proof: physically remove every NON-probed
    # partition directory — the probe must still succeed (it never reads
    # them), while a pre-listed full scan must fail on the missing files
    import glob as _glob
    import shutil

    probe_cells = set(similarity.nearest_cells(cents, q, 2))
    full_before = spark.read.parquet(path)
    removed = 0
    for d in _glob.glob(path + "/_cell=*"):
        if int(d.rsplit("=", 1)[1]) not in probe_cells:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0
    assert [r.asDict() for r in probed.collect()] == \
        [r.asDict() for r in inline.collect()]
    with pytest.raises(Exception):
        full_before.count()


def test_stratified_sampler_pushes_zero_rate_strata(spark):
    """Rate-0 strata become an explicit NOT-IN predicate that reaches the
    parquet scan (the md5 threshold itself cannot push) — at corpus scale
    a zeroed-out boilerplate source is skipped at the IO layer."""
    from geonames_rdf_spark.operators import sampling

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sampling.sample_stratified(
        docs, {"src0": 0.0, "src1": 0.5}, default_rate=1.0)
    plan = plan_of(out)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "source" in pushed
    assert out.filter("source = 'src0'").count() == 0


def test_chunk_documents_no_shuffle_single_codegen(spark):
    """chunk_documents is ONE narrow map stage: no Exchange in the plan
    (a shuffle here would re-distribute the full corpus text for what is
    a per-row transform) and the whole chain stays JVM-side (no Python
    evals)."""
    from geonames_rdf_spark.operators import packing

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(packing.chunk_documents(docs))
    assert "Exchange" not in plan, plan
    for marker in ("ArrowEval", "BatchEval", "PythonUDF", "MapInPandas"):
        assert marker not in plan, plan


def test_redact_pii_no_shuffle_no_python(spark):
    """redact_pii is pure codegen regexp work: no Exchange, no Python
    boundary — the corpus-scale PII pass is a map-only scan."""
    from geonames_rdf_spark.operators import privacy

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(privacy.redact_pii(docs))
    assert "Exchange" not in plan, plan
    for marker in ("ArrowEval", "BatchEval", "PythonUDF", "MapInPandas"):
        assert marker not in plan, plan


def test_normalize_url_no_shuffle_dedup_single_exchange(spark):
    """URL canonicalization is a zero-exchange codegen map; the URL-level
    dedup adds exactly ONE exchange (the canonical-url window)."""
    from geonames_rdf_spark.operators import urls

    pages = spark.createDataFrame(
        [("http://a.com/x", "t1")], "url string, warc_ts string")
    norm = pages.select(urls.normalize_url_expr(F.col("url")))
    plan_n = plan_of(norm)
    assert "Exchange" not in plan_n and "PythonUDF" not in plan_n
    plan_d = plan_of(urls.dedup_pages_by_url(pages))
    assert plan_d.count("Exchange") == 1, plan_d


def test_registered_domain_no_shuffle_no_python(spark):
    """registered_domain_expr is pure codegen Column work: no Exchange,
    no Python in the plan — it fuses into whatever scan precedes it, so
    tagging 10^12 pages with their publisher costs zero extra passes."""
    from geonames_rdf_spark.operators import domains

    pages = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "concat('https://h', doc_id % 7, '.example.co.uk/p',"
        " doc_id) AS url")
    plan = plan_of(pages.select(
        domains.registered_domain_expr(F.col("url")).alias("domain")))
    assert "Exchange" not in plan, plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan


def test_cap_per_domain_routes_overcap_set_off_broadcast(spark):
    """The over-cap domain set is unbounded (the Zipf head by domain
    count), so its three joins must NOT force a broadcast above the
    routing bound: with autoBroadcastJoinThreshold disabled — so the
    ONLY way a broadcast can appear is the operator's own hint — a
    many-over-cap-domains corpus under a tiny bound plans zero
    broadcast joins, while the same corpus under the default bound
    plans all of them broadcast.  Kept sets identical either way."""
    from geonames_rdf_spark.operators import domains

    # 300 window-route domains (4 rows each) + 20 monster-route domains
    # (6 rows each, over window_max_rows=5): every routed set — over,
    # window, big — exceeds the tiny bound, so NO join may broadcast
    rows = [(f"https://d{i}.com/p{j}", f"2026-01-{j + 1:02d}")
            for i in range(300) for j in range(4)]
    rows += [(f"https://m{i}.com/p{j}", f"2026-01-{j + 1:02d}")
             for i in range(20) for j in range(6)]
    pages = spark.createDataFrame(rows, "url string, warc_ts string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        routed = domains.cap_per_domain(pages, max_docs=2,
                                        window_max_rows=5,
                                        broadcast_max_domains=10)
        assert "BroadcastHashJoin" not in plan_of(routed), plan_of(routed)
        assert "BroadcastNestedLoopJoin" not in plan_of(routed)
        hinted = domains.cap_per_domain(pages, max_docs=2,
                                        window_max_rows=5)
        assert "SortMergeJoin" not in plan_of(hinted), plan_of(hinted)
        assert "BroadcastHashJoin" in plan_of(hinted)
        a = sorted(r["url"] for r in routed.collect() if r["domain_kept"])
        b = sorted(r["url"] for r in hinted.collect() if r["domain_kept"])
        assert a == b and len(a) == 640
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dedup_lines_winner_exchange_carries_keys_not_text(spark):
    """The line-dedup winner-election aggregation must shuffle only the
    md5 key + the partial-min (doc_id, pos) struct — never the line
    text (DESIGN.md's shuffle-inventory claim, pinned).  The formatted
    explain lists each Exchange's input attributes; a window/row_number
    formulation would show [doc_id, pos, line, _k] here instead."""
    from geonames_rdf_spark.operators import lines as L

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    df = L.dedup_lines(docs, min_chars=2)
    fmt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    election = [
        b for b in fmt.split("\n\n")
        if b.splitlines() and "Exchange" in b.splitlines()[0]
        and "hashpartitioning(_k" in b and "min#" in b
    ]
    assert election, fmt  # the key-only winner election exists
    for b in election:
        inputs = b.split("Input")[1].splitlines()[0]
        assert "line" not in inputs and "text" not in inputs, b
