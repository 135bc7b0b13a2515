#!/usr/bin/env python3
"""ANN recall/cost sweep: recall@10 vs brute force AND candidate-set cost
for the IVF (nprobe) and hyperplane-LSH (probe_hamming) operators, over
the synthetic embeddings at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints a markdown table (pasted into BENCH.md): a deployment tunes the
probe width against exactly this curve — 'candidates %' is the fraction
of the corpus the exact re-rank touches, i.e. the IO/compute cost knob,
since both families prune BEFORE the cosine re-rank (IVF by partition
pruning on the stored _cell column, LSH by the bucket hamming filter).

Endpoint invariants (recall monotone in probe width; full probe == brute
force exactly) are pytest-pinned in
tests/test_tdp_operators.py::test_ann_recall_monotone_and_full_probe_exact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geonames_rdf_spark.operators import similarity  # noqa: E402
from geonames_rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 10
PLANES = 8
N_CELLS = 8


def _clustered_corpus(spark, n: int = 2000, dim: int = 64,
                      n_clusters: int = 16):
    """Deterministic Gaussian-mixture embeddings (seeded numpy): the shape
    real embedding corpora have — run with ``--clustered`` to see IVF's
    behaviour when cells can align with actual structure, vs the uniform
    worst case the synthetic table gives."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1.0, size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n)
    X = centers[assign] + rng.normal(0, 0.15, size=(n, dim))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [row.astype("float32").tolist() for row in X],
        "label": [f"c{a}" for a in assign],
    })
    return spark.createDataFrame(pdf)


def main() -> None:
    import sys as _sys

    clustered = "--clustered" in _sys.argv
    spark = get_spark(app_name="ann_recall")
    if clustered:
        emb = _clustered_corpus(spark).cache()
    else:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_total = emb.count()
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]])
               for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()]
    dim = len(queries[0][1])
    if clustered:
        # trained coarse quantizer — the honest IVF deployment when the
        # corpus has structure for cells to align with
        cents = similarity.train_ivf_centroids(emb, k=N_CELLS, iters=3)
    else:
        cents = similarity.fixed_centroids(N_CELLS, dim)

    exact = {qid: [r["vec_id"] for r in
                   similarity.cosine_topk(emb, q, k=K).collect()]
             for qid, q in queries}

    # corpus distribution over cells / buckets (cost denominator)
    cell_counts = {r["_cell"]: r["n"] for r in
                   similarity.ivf_assign(emb, cents)
                   .groupBy("_cell").agg(F.count(F.lit(1)).alias("n"))
                   .collect()}
    bucketed = emb.withColumn(
        "_bucket", similarity.lsh_bucket(F.col("embedding"), PLANES, dim=dim))

    src = "clustered-mixture (trained centroids)" if clustered else SF_DIR
    print(f"corpus={n_total} vectors  dim={dim}  k={K}  queries={N_QUERIES}"
          f"  source={src}")
    print("\n| family | probe | recall@10 | candidates % |")
    print("|---|---|---|---|")

    for nprobe in (1, 2, 3, 4, 6, 8):
        rec, cand = 0.0, 0
        for qid, q in queries:
            got = {r["vec_id"] for r in similarity.ann_ivf_topk(
                emb, q, k=K, centroids=cents, nprobe=nprobe).collect()}
            rec += len(got & set(exact[qid])) / K
            cand += sum(cell_counts.get(c, 0) for c in
                        similarity.nearest_cells(cents, q, nprobe))
        print(f"| IVF ({N_CELLS} cells) | nprobe={nprobe} |"
              f" {rec / N_QUERIES:.2f} |"
              f" {100.0 * cand / (N_QUERIES * n_total):.1f} |")

    for ph in (0, 1, 2, 3, 4):
        rec, cand = 0.0, 0
        for qid, q in queries:
            got = {r["vec_id"] for r in similarity.ann_lsh_topk(
                emb, q, k=K, planes=PLANES, probe_hamming=ph).collect()}
            rec += len(got & set(exact[qid])) / K
            qsig = similarity.lsh_bucket(
                F.array(*[F.lit(float(x)) for x in q]), PLANES, dim=dim)
            cand += (bucketed.filter(
                F.bit_count(F.col("_bucket").bitwiseXOR(qsig)) <= ph).count())
        print(f"| LSH ({PLANES} planes) | hamming<={ph} |"
              f" {rec / N_QUERIES:.2f} |"
              f" {100.0 * cand / (N_QUERIES * n_total):.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
