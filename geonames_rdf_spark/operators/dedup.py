"""Deduplication operators for training-data pipelines.

Exact dedup is a hash-groupBy (fully oracle-checkable); near-dup detection
ships three scale-path families — MinHash+LSH, SimHash, and n-gram
Jaccard verification — with all hashing derived from md5 (no Python
``hash()``: that is salted per process and would break determinism across
executors).  Signatures are computed in Arrow-batched pandas UDFs; the
candidate generation is a band-bucket self-join (shuffle keyed by band
hash, quadratic only within buckets), never an all-pairs cross join.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M64 = (1 << 64) - 1
# 2^31-1: keeps a*x inside uint64 for the numpy-vectorized hash family
MERSENNE = (1 << 31) - 1


def _h64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


def _ensure_parallel(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Parallelism floor for the Python-vectorized signature stages.

    A dimension-small input (one parquet file == one split) would run the
    whole ``mapInPandas`` hashing stage on a single core; repartitioning
    to the session's default parallelism spreads it.  Scale-adaptive
    no-op: any input already at >= the floor (the corpus-scale case —
    real corpora arrive in thousands of splits) passes through untouched,
    so no shuffle is ever added where it wouldn't pay for itself.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(text_hash, keep_id, n_dups): one row per distinct text; keep_id =
    min id (deterministic survivor), n_dups = cluster size."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def _shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       n_hashes: int = 64) -> DataFrame:
    """(id, sig array<long>) — MinHash over word k-shingles.

    Universal-hash family a*x+b mod p with (a, b) derived from md5 of the
    seed index — identical on every executor, every run.
    """
    params = [
        (1 | _h64(f"minhash-a-{i}") % MERSENNE, _h64(f"minhash-b-{i}") % MERSENNE)
        for i in range(n_hashes)
    ]

    def sig(batches):
        import numpy as np

        A = np.array([p[0] for p in params], dtype=np.uint64)[:, None]
        B = np.array([p[1] for p in params], dtype=np.uint64)[:, None]
        P = np.uint64(MERSENNE)
        for pdf in batches:
            out_ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingles(text or "", k)
                base = np.fromiter(
                    ((_h64(s) % MERSENNE) for s in sh), dtype=np.uint64,
                    count=len(sh),
                ) if sh else np.zeros(1, dtype=np.uint64)
                # (a*x + b) mod p, vectorized over (n_hashes, n_shingles);
                # a, x < 2^31 so a*x fits in uint64
                sigs.append(((A * base + B) % P).min(axis=1).astype("int64").tolist())
                out_ids.append(did)
            yield pd.DataFrame({"id": out_ids, "sig": sigs})

    return _ensure_parallel(
        docs.select(F.col(id_col), F.col(text_col))
    ).mapInPandas(sig, schema="id bigint, sig array<bigint>")


def _guard_oversized_buckets(keyed: DataFrame, key_cols: list[str],
                             id_col: str, max_bucket: int, mode: str,
                             observation=None) -> tuple[DataFrame, list[str]]:
    """Cap the per-bucket cardinality of an LSH candidate self-join.

    One boilerplate-heavy cluster (cookie banners, SEO templates) can put
    10^6+ docs into a single band bucket and turn the within-bucket join
    quadratic.  This guard counts rows per bucket (one extra shuffle,
    co-partitioned with the candidate join) and either:

    - ``mode='drop'``  — skips oversized buckets entirely (recall loss is
      confined to documents that ONLY collide in mega-buckets — for
      near-dup dedup those are exactly the boilerplate clusters exact
      dedup should collapse first);
    - ``mode='split'`` — salts each oversized bucket into
      ``ceil(n/max_bucket)`` groups joined within-group only, bounding
      work at ~max_bucket^2 per group (cross-group pairs in that bucket
      are sacrificed — a documented recall cap, never silent work blowup).

    ``observation`` (pyspark Observation) rides the next action with
    (oversized_rows, total_rows) so lineage can record what was degraded.
    Returns (guarded_df, extra_join_key_cols).

    r09 shape: the per-bucket count is a WINDOW over the bucket key —
    one exchange of the keyed rows, after which the candidate self-join
    runs co-partitioned (hash partitioning on the bucket key satisfies
    the join's clustering even with the salt appended); the former
    groupBy + join-back paid a second join pass for the same ``_bn``.
    """
    from pyspark.sql import Window

    out = keyed.withColumn(
        "_bn", F.count(F.lit(1)).over(Window.partitionBy(*key_cols)))
    if observation is not None:
        out = out.observe(
            observation,
            F.count_if(F.col("_bn") > max_bucket).alias("oversized_rows"),
            F.count(F.lit(1)).alias("total_rows"),
        )
    if mode == "drop":
        return out.filter(F.col("_bn") <= max_bucket).drop("_bn"), []
    if mode == "split":
        n_groups = F.greatest(
            F.ceil(F.col("_bn") / F.lit(max_bucket)), F.lit(1))
        out = (out.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), n_groups))
            .drop("_bn"))
        return out, ["_salt"]
    raise ValueError(f"oversize mode must be 'drop' or 'split', got {mode!r}")


DEFAULT_MAX_BUCKET = 100_000
"""Default per-bucket cardinality cap for the LSH self-joins.  Finite BY
DEFAULT: an unguarded band bucket turns quadratic the moment one
boilerplate cluster floods it (10^6 docs in one bucket = 10^12 candidate
pairs), and a default of ``None`` means every caller that forgets the
knob ships the pathological path.  100k keeps worst-case within-bucket
work at ~10^10 comparisons per oversized group under ``oversize='split'``
— bounded, loud (observe() telemetry), and far above any non-pathological
bucket.  Pass ``max_bucket=None`` to explicitly opt back into exact,
unguarded LSH semantics."""


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16,
                        n_hashes: int = 64,
                        max_bucket: int | None = DEFAULT_MAX_BUCKET,
                        oversize: str = "split",
                        guard_observation=None) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate (id_a < id_b) pairs.

    One shuffle keyed by (band, bucket-hash); hot buckets are bounded by
    band width, and the join is within-bucket only — the LSH trick that
    makes near-dup detection linear-ish at corpus scale.

    ``n_hashes`` is a parameter (the caller that built the signatures
    knows it) — probing the data with ``first()`` would run an eager job
    re-executing the signature stage and crash on an empty corpus.  A
    width-guard fails loudly if the parameter disagrees with the actual
    signature arrays (out-of-range ``sig[idx]`` is NULL and ``concat_ws``
    SKIPS nulls, which would silently collide documents into shared
    band buckets instead of erroring).
    """
    rows_per_band = n_hashes // bands
    sigs = sigs.withColumn(
        "sig",
        F.when(F.size("sig") == n_hashes, F.col("sig")).otherwise(
            F.raise_error(F.concat(
                F.lit(f"lsh_candidate_pairs: expected {n_hashes}-hash"
                      " signatures, got width "),
                F.coalesce(F.size("sig").cast("string"), F.lit("NULL")),
            )).cast("array<bigint>")
        ),
    )
    # band-hash array as ONE parsed SQL expression: identical semantics
    # to the Column-API rendering (xxhash64 over the comma-joined band
    # positions) at a fraction of the plan-construction cost — the
    # per-element Column calls were ~160 py4j round trips per plan
    band_sql = "array({})".format(", ".join(
        "xxhash64(concat_ws(',', {}))".format(", ".join(
            f"cast(sig[{b * rows_per_band + r}] as string)"
            for r in range(rows_per_band)))
        for b in range(bands)))
    banded = sigs.select(
        "id", F.posexplode(F.expr(band_sql)).alias("band", "bucket"))
    join_keys = ["band", "bucket"]
    if max_bucket is not None:
        banded, extra = _guard_oversized_buckets(
            banded, join_keys, "id", max_bucket, oversize, guard_observation)
        join_keys = join_keys + extra
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, join_keys)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_similarity(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    # one parsed expression (identical semantics to the former
    # Column-API zip_with/filter lambdas, at a fraction of the py4j
    # plan-construction cost)
    agree = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(agree / F.size("sig_a"), 4).alias("est_jaccard"),
        )
    )


def collapse_identical_signatures(
        sigs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Exact-signature pre-collapse for the MinHash pipeline.

    Returns ``(members, vsigs)``: ``members`` is the input plus a ``vid``
    column (min member id per distinct signature — the group
    representative), ``vsigs`` is one ``(id, sig)`` row per DISTINCT
    signature.  One shuffle keyed by the full signature array
    (``array<bigint>`` is a valid Spark grouping key, so no lossy hash of
    the signature is involved).  Banding/LSH then runs over ``vsigs``
    only — a flood of literal duplicates contributes ONE row to the
    candidate join instead of n quadratic ones."""
    from pyspark.sql import Window

    m = sigs.withColumn(
        "vid", F.min("id").over(Window.partitionBy("sig"))
    ).localCheckpoint(eager=False)
    vsigs = (m.filter(F.col("id") == F.col("vid"))
             .select("id", "sig"))
    return m, vsigs


def minhash_near_dups(docs: DataFrame, threshold: float = 0.6,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, n_hashes: int = 64,
                      bands: int = 16,
                      max_bucket: int | None = DEFAULT_MAX_BUCKET,
                      oversize: str = "split",
                      guard_observation=None) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: (id_a, id_b, est_jaccard).

    Scale shape (mirrors ``simhash_near_dups`` — the two defenses a
    10^9+-doc corpus needs):

    1. **exact-signature pre-collapse** — documents are first grouped by
       their full signature ARRAY (one shuffle keyed by sig); banding and
       the bucket self-join run over DISTINCT signatures only, so a flood
       of literal duplicates (the most common web pathology: 10^6 copies
       of a template page share every band bucket) contributes ONE row to
       the LSH join instead of n quadratic ones.  Member pairs are
       expanded back afterwards: within-group pairs have est_jaccard 1.0
       by construction (all positions agree), cross-group pairs inherit
       the representative similarity.  Output is IDENTICAL to the
       uncollapsed pipeline — banding is a pure function of the
       signature, so two docs are candidates iff their signature values
       are — only the work shape changes.
    2. **finite default bucket guard** — ``max_bucket`` defaults to
       ``DEFAULT_MAX_BUCKET`` (see there), bounding residual hot buckets
       of NEAR-but-distinct signatures.  ``None`` opts out.

    The member table ``m`` (inside ``collapse_identical_signatures``)
    feeds every consumer and is localCheckpointed there — its one
    materialization runs the mapInPandas shingling stage exactly once,
    so a second checkpoint layer on the raw signatures would only add a
    physical-planning pass and an extra block copy (removed r09).
    """
    sigs = minhash_signatures(docs, text_col, id_col, k, n_hashes)
    m, vsigs = collapse_identical_signatures(sigs)
    vpairs = lsh_candidate_pairs(vsigs, bands, n_hashes=n_hashes,
                                 max_bucket=max_bucket, oversize=oversize,
                                 guard_observation=guard_observation)
    vsim = (minhash_similarity(vsigs, vpairs)
            .filter(F.col("est_jaccard") >= threshold)
            .withColumnRenamed("id_a", "vid_a")
            .withColumnRenamed("id_b", "vid_b"))
    ma = m.select(F.col("id").alias("ia"), F.col("vid").alias("vid_a"))
    mb = m.select(F.col("id").alias("ib"), F.col("vid").alias("vid_b"))
    cross = (
        vsim.join(ma, "vid_a").join(mb, "vid_b")
        .select(F.least("ia", "ib").alias("id_a"),
                F.greatest("ia", "ib").alias("id_b"), "est_jaccard")
    )
    within = (
        m.select(F.col("id").alias("ia"), "vid")
        .join(m.select(F.col("id").alias("ib"), "vid"), "vid")
        .filter(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"),
                F.lit(1.0).alias("est_jaccard"))
    )
    if threshold > 1.0:  # degenerate but keep the filter semantics exact
        within = within.filter(F.lit(False))
    return cross.unionByName(within)


def near_dup_clusters(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b") -> DataFrame:
    """Consolidate pairwise near-dup hits into CLUSTERS: (doc_id,
    cluster) for every document appearing in a pair, with ``cluster`` =
    the smallest doc_id in its connected component — the deterministic
    survivor.  This is the step production dedup actually keeps one doc
    per (FineWeb / BigCode "NearDedup" semantics): pairwise output alone
    over-deletes chains (A~B, B~C would drop both B and C under
    keep-the-smaller-per-pair even though A~C may not hold).

    Scale shape: delegates to ``operators.graph.connected_components``
    (hash-min + pointer doubling, O(log diameter) rounds, two
    exchange-sized joins per round, loud non-convergence) — the same
    kernel the sameAs canonicalization uses; a 10^6-member boilerplate
    cluster converges in ~20 rounds, not 10^6.  Docs in no pair are
    absent (they keep themselves; callers left-anti or coalesce).
    """
    from geonames_rdf_spark.operators.graph import connected_components

    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    return connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster"))


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(id, simhash bigint) — sign-sum of md5 word hashes."""

    def sig(batches):
        import numpy as np

        shifts = np.arange(bits, dtype=np.uint64)
        for pdf in batches:
            ids, out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split()
                if toks:
                    H = np.fromiter((_h64(t) for t in toks), dtype=np.uint64,
                                    count=len(toks))
                    bitmat = (H[:, None] >> shifts) & np.uint64(1)
                    acc = (2 * bitmat.astype(np.int64) - 1).sum(axis=0)
                else:
                    acc = np.full(bits, -1, dtype=np.int64)
                v = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
                if v >= 1 << 63:  # store as signed 64-bit
                    v -= 1 << 64
                ids.append(did)
                out.append(v)
            yield pd.DataFrame({"id": ids, "simhash": out})

    return _ensure_parallel(
        docs.select(F.col(id_col), F.col(text_col))
    ).mapInPandas(sig, schema="id bigint, simhash bigint")


def _simhash_chunk_exprs(col, n_blocks: int) -> list:
    """Disjoint bit-chunk expressions covering all 64 bits (the last block
    absorbs the ``64 % n_blocks`` remainder — full coverage is required
    for the pigeonhole recall guarantee)."""
    width = 64 // n_blocks
    out = []
    for i in range(n_blocks):
        w = width if i < n_blocks - 1 else 64 - i * width
        shifted = F.shiftrightunsigned(col, i * width)
        if w == 64:
            # n_blocks=1: the single chunk IS the full hash; a 2^64-1
            # mask would overflow the signed long literal
            out.append(shifted)
        else:
            out.append(shifted.bitwiseAND(F.lit((1 << w) - 1)))
    return out


def simhash_candidate_values(values: DataFrame, max_hamming: int = 3,
                             n_blocks: int | None = None,
                             sim_col: str = "simhash") -> DataFrame:
    """Candidate pairs of DISTINCT simhash values (sh_a < sh_b) via
    Manku-style combinatorial blocking (Manku/Jain/Das Sarma, WWW'07).

    The 64 bits split into ``n_blocks`` disjoint chunks; a pair within
    hamming ``h`` differs in at most ``h`` chunks, so at least
    ``n_blocks - h`` chunks agree — every size-``(n_blocks - h)`` chunk
    combination is a join key, and at least one key collides for every
    true pair (COMPLETE).  Versus the naive one-chunk key this widens the
    key from 64/(h+1) bits to ``(n_blocks - h) * 64/n_blocks`` bits
    (h=3 default: 16 -> ~32 bits), which shrinks the expected bucket to
    ~n/2^32 — the within-bucket join stays linear-ish at web-corpus
    scale at the cost of C(n_blocks, n_blocks-h) keys per value
    (h=3: 20 keys).
    """
    import itertools

    if not 0 <= max_hamming < 64:
        raise ValueError(f"max_hamming must be in [0, 64), got {max_hamming}")
    if n_blocks is None:
        if max_hamming:
            # widest key whose combo count stays sane; falls back toward
            # h+1 (the pigeonhole minimum, h+1 single-chunk keys) for
            # large radii where C(h+3, 3) would explode
            import math

            n_blocks = next(
                m for m in range(max_hamming + 3, max_hamming, -1)
                if math.comb(m, m - max_hamming) <= 512)
        else:
            n_blocks = 1
    if max_hamming and n_blocks <= max_hamming:
        raise ValueError(
            f"n_blocks ({n_blocks}) must exceed max_hamming ({max_hamming})"
            " for the pigeonhole guarantee")
    n_blocks = min(n_blocks, 64)
    chunks = _simhash_chunk_exprs(F.col(sim_col), n_blocks)
    combos = list(itertools.combinations(range(n_blocks),
                                         n_blocks - max_hamming))
    if len(combos) > 512:
        # C(n_blocks, n_blocks-h) explodes fast (e.g. 6-of-64 blocks =
        # 41k keys per value); a wide request is a parameter mistake, not
        # a plan we should silently execute
        raise ValueError(
            f"simhash blocking would emit {len(combos)} keys per value"
            f" (n_blocks={n_blocks}, max_hamming={max_hamming});"
            " reduce n_blocks")
    keys = values.select(
        F.col(sim_col),
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(
                ",", *[chunks[j].cast("string") for j in combo]))
            for combo in combos
        ])).alias("ck", "key"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(b, ["ck", "key"])
        .filter(F.col(f"a.{sim_col}") < F.col(f"b.{sim_col}"))
        .select(F.col(f"a.{sim_col}").alias("sh_a"),
                F.col(f"b.{sim_col}").alias("sh_b"))
        .distinct()
    )


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_blocks: int | None = None) -> DataFrame:
    """Near-dups by SimHash: (id_a, id_b, hamming), id_a < id_b.

    Scale shape (the two defenses a 10^9+-doc corpus needs):

    1. **exact pre-collapse** — documents are first grouped by simhash
       VALUE, and candidate generation runs over distinct values only, so
       a flood of literal duplicates (the most common web pathology)
       contributes ONE row to the blocking join instead of n quadratic
       ones; member pairs are expanded back afterwards (within-group
       pairs have hamming 0 by construction);
    2. **combinatorial blocking** (``simhash_candidate_values``) — the
       join key is ~32 bits (vs the naive 16-bit single chunk), keeping
       within-bucket joins linear-ish; candidate completeness is
       pigeonhole-guaranteed, so the verified output is IDENTICAL to an
       all-pairs popcount scan.
    """
    sigs = simhash_signatures(docs, text_col, id_col).localCheckpoint(
        eager=False)
    values = sigs.select("simhash").distinct()
    vcand = simhash_candidate_values(values, max_hamming, n_blocks)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    vpairs = (vcand.withColumn("hamming", hamming)
              .filter(F.col("hamming") <= max_hamming))
    ma = sigs.select(F.col("id").alias("ia"), F.col("simhash").alias("sh_a"))
    mb = sigs.select(F.col("id").alias("ib"), F.col("simhash").alias("sh_b"))
    cross = (
        vpairs.join(ma, "sh_a").join(mb, "sh_b")
        .select(F.least("ia", "ib").alias("id_a"),
                F.greatest("ia", "ib").alias("id_b"), "hamming")
    )
    within = (
        ma.join(sigs.select(F.col("id").alias("ib"),
                            F.col("simhash").alias("sh_a")), "sh_a")
        .filter(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"),
                F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(within)


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, k: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact word-k-gram Jaccard for candidate pairs (verification stage).

    Texts join to the (small) candidate pair set; the set intersection
    runs in an Arrow batch.  (id_a, id_b, jaccard)."""
    t = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    joined = (
        pairs.join(t.withColumnRenamed("_id", "id_a")
                     .withColumnRenamed("_text", "text_a"), "id_a")
        .join(t.withColumnRenamed("_id", "id_b")
               .withColumnRenamed("_text", "text_b"), "id_b")
    )

    import math

    def _round4(x: float) -> float:
        # HALF_UP like Spark's F.round / DuckDB's round — Python's built-in
        # round is banker's and disagrees on exact-halfway ratios (58/64)
        return math.floor(x * 10000 + 0.5) / 10000

    def jac(batches):
        for pdf in batches:
            vals = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                sa, sb = _shingles(ta or "", k), _shingles(tb or "", k)
                u = len(sa | sb)
                vals.append(_round4(len(sa & sb) / u) if u else 1.0)
            yield pdf[["id_a", "id_b"]].assign(jaccard=vals)

    return joined.mapInPandas(
        jac, schema="id_a bigint, id_b bigint, jaccard double"
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        planes: int = 16,
                        dim: int | None = None,
                        max_bucket: int | None = DEFAULT_MAX_BUCKET,
                        oversize: str = "split",
                        guard_observation=None) -> DataFrame:
    """Embedding-cosine near-dup via hyperplane-LSH candidates + exact
    cosine verify.  (id_a, id_b, cosine).

    Scale shape mirrors ``minhash_near_dups``: an **exact-vector
    pre-collapse** first (one shuffle keyed by the embedding array —
    re-crawled/mirrored pages embed IDENTICALLY and would otherwise
    flood every hyperplane bucket with n copies), so LSH bucketing and
    the candidate self-join run over DISTINCT vectors only; member
    pairs are expanded back afterwards (within-group pairs carry the
    self-cosine — 1.0 for any non-degenerate vector — and cross-group
    pairs inherit the representative cosine EXACTLY, because cosine is
    a function of the vectors alone).  Plus the finite default
    ``max_bucket`` guard for residual hot buckets of near-but-distinct
    vectors.

    ``dim`` defaults to sampling one row (tiny setup job); pass it
    explicitly in pipelines where the width is known.  ``lsh_bucket``
    raises on any row whose width disagrees — a silent mismatch would
    NULL the hyperplane dots and collapse every vector into bucket 0."""
    from pyspark.sql import Window

    from geonames_rdf_spark.operators.similarity import cosine_expr, lsh_bucket

    if dim is None:
        # sample from a NON-NULL row: a NULL leading embedding would make
        # size() NULL and int(None) raise, defeating lsh_bucket's own
        # null-row tolerance (one bad row must not kill the pass)
        row = (embeddings.filter(F.col(vec_col).isNotNull())
               .select(F.size(vec_col).alias("d")).first())
        if row is None:
            dim = 0  # no non-null rows: any dim yields an empty result
        else:
            dim = int(row["d"])
    base = embeddings.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v"))
    m = base.withColumn(
        "vid", F.min("id").over(Window.partitionBy("v"))
    ).localCheckpoint(eager=False)
    sig = (m.filter(F.col("id") == F.col("vid"))
           .select("id", "v",
                   lsh_bucket(F.col("v"), planes, dim=dim).alias("bucket")))
    join_keys = ["bucket"]
    if max_bucket is not None:
        sig, extra = _guard_oversized_buckets(
            sig, join_keys, "id", max_bucket, oversize, guard_observation)
        join_keys = join_keys + extra
    a, b = sig.alias("a"), sig.alias("b")
    vpairs = (
        a.join(b, join_keys)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("vid_a"), F.col("a.v").alias("va"),
                F.col("b.id").alias("vid_b"), F.col("b.v").alias("vb"))
        .withColumn("cosine", F.round(cosine_expr(F.col("va"),
                                                  F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vid_a", "vid_b", "cosine")
    )
    ma = m.select(F.col("id").alias("ia"), F.col("vid").alias("vid_a"))
    mb = m.select(F.col("id").alias("ib"), F.col("vid").alias("vid_b"))
    cross = (
        vpairs.join(ma, "vid_a").join(mb, "vid_b")
        .select(F.least("ia", "ib").alias("id_a"),
                F.greatest("ia", "ib").alias("id_b"), "cosine")
    )
    within = (
        m.filter(F.col("id") == F.col("vid"))
        .select("vid", F.round(cosine_expr(F.col("v"), F.col("v")),
                               6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .join(m.select(F.col("id").alias("ia"), "vid"), "vid")
        .join(m.select(F.col("id").alias("ib"), "vid"), "vid")
        .filter(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"),
                "cosine")
    )
    return cross.unionByName(within)


def word_ngram_expr(text, n: int):
    """Array of word n-grams (lowercased, whitespace-split) as a pure
    Column expression — stays in whole-stage codegen, no UDF."""
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"),
                    lambda t: t != "")
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(F.sequence(F.lit(1), count),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation set (the standard 13-gram rule).

    Returns one row per doc: (doc_id, n_contaminated, contaminated) where
    ``n_contaminated`` counts DISTINCT leaked n-grams.

    100-TB shape: the benchmark n-gram set is dimension-sized (eval
    suites are millions of n-grams) — hashed to 64-bit and BROADCAST, so
    the corpus side is a map-side semi-join over its exploded n-grams
    with no shuffle except the per-doc hit count (keyed by doc id,
    map-side combinable).  Everything stays JVM-side (no UDF)."""
    bench_grams = (
        benchmark.select(
            F.explode(word_ngram_expr(F.col(bench_text_col), n)).alias("g"))
        .select(F.xxhash64("g").alias("gh")).distinct()
    )
    # plain explode (no _outer): a doc with zero n-grams contributes no
    # rows — xxhash64(NULL) would otherwise map every gramless doc to one
    # constant hash that a pathological benchmark gram could collide with;
    # the left join below still returns every doc with a zero count
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_ngram_expr(F.col(text_col), n)).alias("g"),
    ).select(id_col, F.xxhash64("g").alias("gh"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("gh").alias("n_contaminated"))
    )
    return (
        docs.select(id_col).join(hits, id_col, "left")
        .fillna({"n_contaminated": 0})
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )
