"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k in pure higher-order Column functions (JVM-side,
no UDF) is the correctness baseline; hyperplane-LSH bucketing is the scale
path (shrinks the candidate set by ~2^planes before the exact re-rank).
Hyperplanes are deterministic (md5-seeded), so buckets are stable across
runs and executors.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit(i: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane #i (md5-derived, [-1, 1))."""
    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane-{i}-{j}".encode()).digest()[:8]
        (u,) = struct.unpack("<Q", h)
        vals.append(u / float(1 << 63) - 1.0)
    return vals


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array columns as double (order-stable fold)."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k: one scan, TakeOrderedAndProject (Spark
    keeps only k rows per partition then merges — no global sort)."""
    q = _query_lit(query_vec)
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket(vec: Column, planes: int = 16, dim: int = 64) -> Column:
    """Hyperplane signature: bit i = sign(vec . plane_i); returns bigint."""
    bits = []
    for i in range(planes):
        p = F.array(*[F.lit(v) for v in _unit(i, dim)])
        bits.append(
            F.when(dot_expr(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def ann_lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                 planes: int = 8, vec_col: str = "embedding",
                 id_col: str = "vec_id", probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: restrict the exact re-rank to vectors whose LSH
    bucket is within ``probe_hamming`` bits of the query's bucket
    (multi-probe).  Same output schema as ``cosine_topk``."""
    q = _query_lit(query_vec)
    qsig = lsh_bucket(q, planes)
    sig = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    near = F.bit_count(
        F.col("_bucket").bitwiseXOR(qsig)
    ) <= probe_hamming
    return (
        sig.filter(near)
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pairwise_topk_per_label(embeddings: DataFrame, k: int = 3,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            label_col: str = "label") -> DataFrame:
    """Per-label k-NN (blocked all-pairs): join within label groups only,
    exact cosine, window top-k per query vector.  The blocking key bounds
    the quadratic term — the pattern for 'find my cluster neighbours'."""
    from pyspark.sql import Window

    # pre-normalize once per row (norm is O(dim); doing it inside the
    # pairwise cosine would recompute it O(group_size) times per row)
    base = embeddings.select(
        F.col(label_col).alias("lbl"), F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", norm_expr(F.col("v")))
    a = base.select(F.col("lbl"), F.col("id").alias("id_a"),
                    F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col("lbl"), F.col("id").alias("id_b"),
                    F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, "lbl").filter(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "lbl", "id_a", "id_b",
        F.round(
            dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("id_a", "id_b", "cosine", "rn")
    )
